#!/usr/bin/env python
"""Graft a loop-detection snapshot's NetVLAD head into a registration
snapshot (two-stage training composition).

Parity target: `merge_model.py:5-34` in the reference (copies `netvlad.*`
keys from the LD checkpoint into the registration checkpoint).
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reg_snapshot", required=True, help="stage-1 snapshot dir")
    ap.add_argument("--ld_snapshot", required=True, help="stage-2 snapshot dir")
    ap.add_argument("--output", required=True, help="merged snapshot dir")
    args = ap.parse_args()

    from lcrnet_tpu.config import make_cfg
    from lcrnet_tpu.engine.checkpoint import load_snapshot, merge_netvlad, save_snapshot
    from lcrnet_tpu.pipeline import init_params

    template = {"params": init_params(make_cfg())}
    reg = load_snapshot(args.reg_snapshot, template=template)
    ld = load_snapshot(args.ld_snapshot, template=template)
    merged = merge_netvlad(reg["params"], ld["params"])
    save_snapshot(args.output, 0, merged)
    print(f"merged snapshot written to {args.output}")


if __name__ == "__main__":
    main()
