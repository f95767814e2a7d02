#!/usr/bin/env python
"""Registration training (stage 1).

Parity target: `experiments/registration/trainval_mixed.py:15-74` (Adam 1e-4,
StepLR x0.95 every 4 epochs, 150 epochs, OverallLoss) and its
`trainval_registration.py` / `trainval_loop_closure.py` siblings — selected
by --pair_mode {mixed,registration,loop_closure} which only changes the pair
lists fed in.

Usage:
  python experiments/train_registration.py --dataset_root /path/KITTI \
      --pair_root /path/pairs --seqs 5 6 7 9 --output out/reg
"""

import argparse
import glob
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", required=True)
    ap.add_argument("--pair_root", required=True, help="dir of per-seq pair text files")
    ap.add_argument("--seqs", type=int, nargs="+", default=[5, 6, 7, 9])
    ap.add_argument("--output", default="output/registration")
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--max_epoch", type=int, default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--dp", type=int, default=None, help="data-parallel width")
    ap.add_argument("--mp", type=int, default=1,
                    help="point-axis (model-parallel) width per pair")
    ap.add_argument("--halo", action="store_true",
                    help="use the explicit ring-halo shard_map train step "
                         "(engine/train.py::make_train_step_mp) instead of "
                         "XLA sharding propagation")
    ap.add_argument("--chunk", type=int, default=1,
                    help="optimizer steps per device dispatch (single-chip; "
                         "amortizes relay dispatch latency)")
    # multi-host launch (reference DDP launcher analogue): pass the same
    # coordinator to every process; omit all three for single-host runs
    ap.add_argument("--coordinator", default=None, help="host:port of process 0")
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    args = ap.parse_args()

    from lcrnet_tpu.parallel.mesh import make_mesh, setup_distributed

    setup_distributed(args.coordinator, args.num_processes, args.process_id)

    from lcrnet_tpu.config import make_cfg
    from lcrnet_tpu.data.loader import make_kitti_registration_dataset, pair_loader
    from lcrnet_tpu.engine.trainer import EpochTrainer

    cfg = make_cfg()
    datasets = []
    for seq in args.seqs:
        for pf in sorted(glob.glob(osp.join(args.pair_root, f"{seq:02d}*"))):
            datasets.append(
                make_kitti_registration_dataset(cfg, args.dataset_root, seq, pf, augment=True)
            )
    if not datasets:
        raise SystemExit(f"no pair files found under {args.pair_root}")

    class Concat:
        def __init__(self, ds):
            self.ds = ds
            self.offsets = []
            total = 0
            for d in ds:
                self.offsets.append(total)
                total += len(d)
            self.total = total

        def __len__(self):
            return self.total

        def __getitem__(self, i):
            for off, d in zip(reversed(self.offsets), reversed(self.ds)):
                if i >= off:
                    return d[i - off]
            raise IndexError(i)

    dataset = Concat(datasets)
    steps_per_epoch = len(dataset) // args.batch_size

    mesh = (
        make_mesh(dp=args.dp, mp=args.mp)
        if (args.dp or args.mp > 1 or args.halo)
        else None
    )

    epoch_counter = [0]

    def train_loader():
        epoch_counter[0] += 1
        return pair_loader(dataset, args.batch_size, shuffle=True, seed=epoch_counter[0])

    trainer = EpochTrainer(
        cfg,
        train_loader,
        output_dir=args.output,
        steps_per_epoch=steps_per_epoch,
        mesh=mesh,
        chunk=args.chunk,
        halo=args.halo,
    )
    if args.resume:
        trainer.resume()
    trainer.run(max_epoch=args.max_epoch)


if __name__ == "__main__":
    main()
