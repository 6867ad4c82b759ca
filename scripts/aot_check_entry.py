"""Chipless AOT compile check of the driver gate `entry()`.

The axon tunnel's AOT compiler (`.lower().compile()`) builds TPU programs
without touching the chip (docs/MESH_TIERS.md "Compile-only probes are
CHIPLESS"), so this settles "will the driver's single-chip compile gate
pass?" while the chip is busy training.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/aot_check_entry.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from __graft_entry__ import entry


def main():
    # Guard against a meaningless CPU success: without /root/.axon_site on
    # PYTHONPATH the axon backend never registers, jax falls back to CPU,
    # and the compile proves nothing about the TPU gate.
    backend = jax.default_backend()
    assert backend != "cpu", (
        "default backend is CPU — run with "
        "PYTHONPATH=/root/repo:/root/.axon_site so the probe compiles "
        "for the TPU backend")
    fn, args = entry()
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    print(f"AOT ENTRY OK [{backend}] ({time.time()-t0:.0f}s) "
          f"flops={compiled.cost_analysis().get('flops', 0):.3g}",
          flush=True)


if __name__ == "__main__":
    main()
