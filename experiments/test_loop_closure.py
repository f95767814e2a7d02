#!/usr/bin/env python
"""Loop-closure registration testing.

Parity target: `experiments/registration/test_loop_closure.py` — identical
dump pipeline to `test_registration.py`, fed with loop pairs (spatially
close revisits) instead of consecutive pairs, writing into the
loop-closing feature dir.  This wrapper exists for CLI familiarity; it
forwards to the shared implementation with loop-closure defaults.
"""

import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

if __name__ == "__main__":
    if "--feature_dir" not in sys.argv:
        sys.argv += ["--feature_dir", "output/features/loop_closing"]
    from test_registration import main

    main()
