"""Backend selection: which compute path runs the heavy per-iteration steps.

The reference makes its compute engine the product unconditionally
(data/assemble.sh:92-145 runs kmermatcher/rescorediagonal as the pipeline);
here the equivalent is routing those steps to the device backend whenever an
accelerator is attached. `--backend auto` (the CLI default) resolves to:

 - "jax"     one accelerator (TPU/GPU) visible — single-chip device pipeline
 - "sharded" more than one accelerator — mesh pipeline (parallel/mesh.py)
 - "numpy"   host-only (CPU jax or no jax)

Explicit values (numpy/jax/sharded) pass through untouched so tests and
benchmarks can pin a path.
"""
from .log import logger

_VALID = ("auto", "numpy", "jax", "sharded")


def resolve_backend(requested: str = "auto") -> str:
    if requested not in _VALID:
        raise ValueError(
            f"--backend must be one of {', '.join(_VALID)}; got {requested!r}")
    if requested != "auto":
        return requested
    try:
        import jax
        devices = jax.devices()
    except Exception:  # jax missing or no backend initialisable
        return "numpy"
    accel = [d for d in devices if d.platform not in ("cpu",)]
    if not accel:
        return "numpy"
    resolved = "sharded" if len(accel) > 1 else "jax"
    logger.info("backend auto: %d %s device(s) -> %s", len(accel),
                accel[0].platform, resolved)
    return resolved
