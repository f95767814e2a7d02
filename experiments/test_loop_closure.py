#!/usr/bin/env python
"""Loop-closure registration testing.

Parity target: `experiments/registration/test_loop_closure.py` — the
reference twin of `test_registration.py` differing only in its pair source
(loop pairs from the overlap-GT text, i.e. spatially close revisits instead
of consecutive-with-distance pairs) and its dump directory
(`features/loop_closing/`).  This CLI owns those loop-closure defaults and
runs the shared per-pair dump pipeline (`test_registration.run`): per pair,
points, correspondences, scores, estimated + GT transform npz artifacts for
`eval_registration.py`.

Usage:
  python experiments/test_loop_closure.py --dataset_root ROOT \
      --pair_file loop_overlap0.3/08 [--seq 8] [--snapshot DIR]
"""

import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from test_registration import build_parser, run


def main(argv=None):
    ap = build_parser(
        feature_dir_default="output/features/loop_closing",
        description=__doc__,
    )
    args = ap.parse_args(argv)
    run(args)


if __name__ == "__main__":
    main()
