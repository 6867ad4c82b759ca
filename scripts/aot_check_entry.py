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
    fn, args = entry()
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    print(f"AOT ENTRY OK ({time.time()-t0:.0f}s) "
          f"flops={compiled.cost_analysis().get('flops', 0):.3g}",
          flush=True)


if __name__ == "__main__":
    main()
