#!/usr/bin/env python
"""Convert a reference torch checkpoint into a framework snapshot.

Completes the checkpoint-parity chain (reference `merge_model.py:5-34` +
`kernel_points.py:426-455`): load the torch `.tar` state_dict, map it onto
this framework's parameter tree (`engine/convert.py`), optionally install
the reference kernel dispositions from the shipped PLY, and write an orbax
snapshot that every CLI here accepts via --snapshot.

Usage:
  python experiments/convert_snapshot.py --torch_snapshot best-model-mixed.tar \
      --output output/converted \
      --dispositions /path/to/k_015_center_3D.ply
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_snapshot", required=True)
    ap.add_argument("--output", required=True, help="orbax snapshot directory")
    ap.add_argument("--dispositions", default=None,
                    help="reference kernel-disposition PLY (k_015_center_3D.ply); "
                         "installed process-wide and saved next to the snapshot")
    ap.add_argument("--num_layers", type=int, default=4, help="transformer layers")
    args = ap.parse_args()

    import numpy as np

    from lcrnet_tpu.engine.checkpoint import save_snapshot
    from lcrnet_tpu.engine.convert import convert_state_dict, load_torch_snapshot

    if args.dispositions:
        from lcrnet_tpu.models.kernel_points import load_reference_dispositions

        pts = load_reference_dispositions(args.dispositions)
        np.save(osp.join(osp.dirname(osp.abspath(args.output)) or ".",
                         "kernel_dispositions.npy"), pts)
        print(f"installed reference dispositions ({pts.shape[0]} kernel points)")

    sd = load_torch_snapshot(args.torch_snapshot)
    params = convert_state_dict(sd, num_layers=args.num_layers)
    n_leaves = len([1 for _ in _iter_leaves(params)])
    save_snapshot(args.output, 0, params)
    print(f"wrote snapshot ({n_leaves} parameter tensors) to {args.output}")
    if args.dispositions:
        print("NOTE: runs consuming this snapshot must install the dispositions "
              "first: lcrnet_tpu.models.kernel_points.load_reference_dispositions(...)")


def _iter_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _iter_leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
