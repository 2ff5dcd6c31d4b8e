"""Profiling hooks: jax.profiler traces + compile-time memory analysis.

TPU-native replacement for the reference's ad-hoc timing and CUDA memory
probes (SURVEY §5.1: `torch.cuda.synchronize` spans, `CudaMemoryProfiler`,
`profile_run` dummy-batch probing, `torch.cuda.mem_get_info` arithmetic —
worker.py:120-164, model_runner.py:888-953). On TPU the compiler KNOWS the
memory footprint before execution: `compiled.memory_analysis()` replaces
the empirical probe, and `jax.profiler.trace` produces XProf/TensorBoard
traces instead of event timers.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace into log_dir (no-op when None/unsupported).

    View with TensorBoard's profile plugin or xprof.
    """
    import jax

    if not log_dir:
        yield
        return
    try:
        with jax.profiler.trace(log_dir):
            yield
    except (NotImplementedError, RuntimeError) as e:  # tunnel backends
        print(f"profiler trace unavailable on this backend: {e}")
        yield


def memory_analysis(fn, *args, **kwargs) -> Dict[str, Any]:
    """Compile `fn` AOT and report the compiler's memory breakdown.

    The TPU equivalent of the reference's empirical KV-sizing probe
    (`determine_num_available_blocks`): exact, and available BEFORE
    running anything.
    """
    import jax

    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    if ma is None:
        return {}
    fields = ["argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "generated_code_size_in_bytes",
              "alias_size_in_bytes"]
    out = {f: getattr(ma, f, None) for f in fields}
    total = sum(v for v in out.values() if v)
    out["total_bytes"] = total
    return out


def format_memory(report: Dict[str, Any]) -> str:
    if not report:
        return "memory analysis unavailable"
    gb = 1024 ** 3
    parts = [f"{k.replace('_size_in_bytes', '')}="
             f"{(v or 0) / gb:.3f}GiB" for k, v in report.items()
             if k != "total_bytes"]
    return (f"device memory: total {report['total_bytes'] / gb:.3f}GiB "
            f"({', '.join(parts)})")
