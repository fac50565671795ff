"""Test configuration: run everything on a virtual 8-device CPU mesh.

Pallas kernels run in interpreter mode off-TPU (auto-detected in
ops/quant.py:default_interpret) — the TPU analog of the reference's
TRITON_INTERPRETER=1 no-hardware test mode
(reference script/run_triton_bench_qk_int4.sh:11).

Set LOWBIT_FA_TEST_TPU=1 to run the suite against real TPU hardware instead.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

if os.environ.get("LOWBIT_FA_TEST_TPU") != "1":
    # Force CPU even when the TPU plugin was registered by sitecustomize.
    jax.config.update("jax_platforms", "cpu")

# Build the native host extension on first run (csrc/lowbit_host.cpp); the
# numpy fallback keeps everything working if the toolchain is missing.
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if not any(
    f.startswith("_lowbit_host") and f.endswith(".so")
    for f in os.listdir(os.path.join(_repo, "lowbit_quant_fa2_paddle_tpu", "host"))
):
    import subprocess

    subprocess.run(
        [sys.executable, "setup.py", "build_ext", "--inplace"],
        cwd=_repo,
        capture_output=True,
        timeout=300,
        check=False,
    )
