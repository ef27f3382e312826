"""Pre-generate the decode benchmark fixture set OUTSIDE the bench envelope.

bench.py only decodes the full 32-video set when it is already cached under
``.bench_videos/`` (x264 encode costs >15 min on a 1-core host — never affordable
inside the 1200 s envelope). ``.bench_videos/`` is gitignored, so a fresh checkout
measures the reduced 16-video fallback until this script (or run_hw_checklist.sh,
which calls it as step 0.5) has run once on the machine (ADVICE r4: the full set
was otherwise unreachable on any committed path). The emitted record always says
which fixture was used (``detail.decode_fixture``: "full32" | "reduced16").

Usage: ``python scripts/gen_bench_videos.py [--reduced]``
"""

import argparse
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reduced", action="store_true", help="generate only the 16-video fallback set")
    args = ap.parse_args()

    from ted_spad_tpu.utils.bench_videos import FULL_SPEC, REDUCED_SPEC, generate_fixture_set

    spec = REDUCED_SPEC if args.reduced else FULL_SPEC
    t0 = time.perf_counter()
    uris = generate_fixture_set(
        spec=spec, log_fn=lambda m: print(f"[gen {time.perf_counter() - t0:6.1f}s] {m}", flush=True)
    )
    print(f"fixture set ready: {len(uris)} videos in {time.perf_counter() - t0:.0f}s")


if __name__ == "__main__":
    main()
