"""One-process measurement session: pending real-chip A/Bs (round 2b).

Bundles every pending measurement into ONE process so a single good
tunnel window pays all first-compile costs (NOTES_r2: first compile in
a fresh process is 200-390 s; subsequent compiles are seconds):

  1. halo-free presplit patch-kernel A/B (scripts/ab_presplit_halofree)
  2. fleet trainer bench, K=1 and K=10 (bench_fleet)

Prints labeled lines; exits nonzero on parity failure.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    t0 = time.time()
    import ab_presplit_halofree

    ab_presplit_halofree.main()
    print(f"[{time.time() - t0:.0f}s] halo-free A/B done", flush=True)

    import bench_fleet

    os.environ["KMSR_FLEET_ITERS"] = "20"
    for k in ("1", "10"):
        os.environ["KMSR_FLEET_K"] = k
        print(f"--- fleet K={k} ---", flush=True)
        bench_fleet.main()
        print(f"[{time.time() - t0:.0f}s]", flush=True)
    print(f"[{time.time() - t0:.0f}s] all done", flush=True)


if __name__ == "__main__":
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)))
    )
    main()
