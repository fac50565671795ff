"""Eval/inference kit — the reference's ``inferenceKit`` side tree
(src/triton/utils/inferenceKit/: dataset loaders, answer grader, batched
inference with resume, layered config), rebuilt for the jax stack."""

from lowbit_quant_fa2_paddle_tpu.evalkit.config import InferenceConfig
from lowbit_quant_fa2_paddle_tpu.evalkit.datasets import DATASETS, load_dataset
from lowbit_quant_fa2_paddle_tpu.evalkit.grader import extract_answer, grade_numeric
from lowbit_quant_fa2_paddle_tpu.evalkit.inference import run_inference
