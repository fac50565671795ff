"""Utility-layer tests: logger, parser, benchmark math."""

import logging
import os

from lowbit_quant_fa2_paddle_tpu.utils.benchmark import attention_flops, tflops
from lowbit_quant_fa2_paddle_tpu.utils.logger import Logger, eval_log
from lowbit_quant_fa2_paddle_tpu.utils.parser import bench_parser, save_name


def test_attention_flops_convention():
    # reference: 4*B*H*D*S^2, halved when causal (utils/benchmark.py:212-214)
    assert attention_flops(4, 32, 64, 1024, 1024, False) == 4 * 4 * 32 * 64 * 1024 * 1024
    assert attention_flops(4, 32, 64, 1024, 1024, True) == 2 * 4 * 32 * 64 * 1024 * 1024
    assert tflops(2e12, 1.0) == 2.0


def test_logger_writes_file(tmp_path):
    path = str(tmp_path / "x.log")
    lg = Logger("t1", path)
    lg.info("hello %d", 7)
    for h in lg.logger.handlers:
        h.flush()
    assert "hello 7" in open(path).read()


def test_eval_log_renames_on_success(tmp_path):
    path = str(tmp_path / "run.log")

    @eval_log(path)
    def job(logger=None):
        logger.info("working")
        return 42

    assert job() == 42
    assert not os.path.exists(path)
    assert os.path.exists(str(tmp_path / "_eval_run.log"))


def test_parser_defaults_and_save_name():
    args = bench_parser().parse_args([])
    assert args.batch_size == 4 and args.num_heads == 32 and args.head_dim == 64
    name = save_name(args)
    assert "bits-int8" in name and "batch_size-4" in name
    args2 = bench_parser().parse_args(["--bits", "int4", "--causal"])
    assert args2.bits == "int4" and args2.causal
