"""End-to-end CLI smoke tests over a synthetic KITTI tree.

Exercises the experiment scripts as subprocesses (the integration level the
reference only covers via manual benchmark runs — SURVEY.md §4): scan files
on disk -> test_registration dumps -> eval_registration metrics, and the
demo path.
"""

import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))


def make_kitti_tree(tmp_path, rng, n_frames=4, n_points=400):
    root = tmp_path / "kitti"
    seq_dir = root / "downsampled_xyzi" / "08"
    seq_dir.mkdir(parents=True)
    base = np.zeros((n_points, 3), np.float32)
    side = int(np.ceil(np.sqrt(n_points)))
    xy = np.stack(np.meshgrid(np.arange(side), np.arange(side)), -1).reshape(-1, 2)[:n_points]
    base[:, :2] = xy * 0.4
    base[:, 2] = np.sin(base[:, 0] * 0.5)
    scans = []
    poses = []
    for i in range(n_frames):
        yaw = 0.1 * i
        c, s = np.cos(yaw), np.sin(yaw)
        r = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        t = np.array([2.0 * i, 0.5 * i, 0.0], np.float32)
        pose = np.eye(4, dtype=np.float64)
        pose[:3, :3] = r
        pose[:3, 3] = t
        poses.append(pose)
        world = base @ r.T + t  # static world scene seen from moving sensor?
        scan = (base + rng.normal(scale=0.005, size=base.shape)).astype(np.float32)
        # scan i sees the world points expressed in its own frame
        scan = ((base - t) @ r).astype(np.float32)
        scans.append(scan)
        np.save(seq_dir / f"{i:06d}.npy", scan)
    # pair file: consecutive pairs with GT relative transforms
    pair_lines = []
    for i in range(n_frames - 1):
        rel = np.linalg.inv(poses[i + 1]) @ poses[i]  # src=i -> ref=i+1
        row = [i, i + 1] + list(rel[:3, :4].reshape(-1))
        pair_lines.append(" ".join(str(v) for v in row))
    pair_file = root / "pairs_08.txt"
    pair_file.write_text("\n".join(pair_lines))
    return root, pair_file


def run_cli(args, env_extra=None):
    env = dict(os.environ)
    env["LCRNET_PRESET"] = "test"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ROOT
    if env_extra:
        env.update(env_extra)
    return subprocess.run(
        [sys.executable] + args, env=env, capture_output=True, text=True, timeout=1200, cwd=ROOT
    )


@pytest.mark.slow
def test_registration_dump_and_eval(tmp_path, rng):
    root, pair_file = make_kitti_tree(tmp_path, rng)
    feature_dir = tmp_path / "features"
    r = run_cli(
        [
            "experiments/test_registration.py",
            "--dataset_root", str(root),
            "--seq", "8",
            "--pair_file", str(pair_file),
            "--feature_dir", str(feature_dir),
            "--limit", "2",
        ]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    dumps = list(feature_dir.glob("*.npz"))
    assert len(dumps) == 2
    d = np.load(dumps[0])
    assert d["estimated_transform"].shape == (4, 4)

    r2 = run_cli(
        ["experiments/eval_registration.py", "--feature_dir", str(feature_dir), "--method", "lgr"]
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "RR:" in r2.stdout and "PIR:" in r2.stdout

    r3 = run_cli(
        ["experiments/eval_registration.py", "--feature_dir", str(feature_dir), "--method", "svd"]
    )
    assert r3.returncode == 0, r3.stderr[-3000:]


@pytest.mark.slow
def test_loop_detection_cli(tmp_path, rng):
    root, _ = make_kitti_tree(tmp_path, rng, n_frames=4)
    desc_dir = tmp_path / "desc"
    r = run_cli(
        [
            "experiments/test_loop_detection.py",
            "--dataset_root", str(root),
            "--seq", "8",
            "--descriptor_dir", str(desc_dir),
            "--batch", "2",
        ]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    d = np.load(desc_dir / "seq08_descriptors.npz")
    assert d["descriptors"].shape[1] == 256
    norms = np.linalg.norm(d["descriptors"], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_preextract_features_cli(tmp_path, rng):
    root, _ = make_kitti_tree(tmp_path, rng, n_frames=3)
    out_dir = tmp_path / "preextract"
    r = run_cli(
        [
            "experiments/preextract_features.py",
            "--dataset_root", str(root),
            "--seq", "8",
            "--output", str(out_dir),
        ]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    files = sorted(out_dir.glob("08_*.npz"))
    assert len(files) == 3
    d = np.load(files[0])
    # stage-4 features at the test preset: (N4, init_dim * 16)
    assert d["feats"].shape[0] == d["points"].shape[0] == d["mask"].shape[0]
    assert d["feats"].shape[1] == 1024
    assert d["mask"].any()
    # masked rows carry finite features
    assert np.isfinite(d["feats"][d["mask"]]).all()


@pytest.mark.slow
def test_registration_multipair_batch_matches_single(tmp_path, rng):
    """--pairs_per_batch 2 (one program per 2 pairs, padded tail) must dump
    the same per-pair results as the default per-pair path."""
    root, pair_file = make_kitti_tree(tmp_path, rng)
    single_dir = tmp_path / "single"
    batch_dir = tmp_path / "batched"
    base = [
        "experiments/test_registration.py",
        "--dataset_root", str(root),
        "--seq", "8",
        "--pair_file", str(pair_file),
        "--limit", "3",
    ]
    r1 = run_cli(base + ["--feature_dir", str(single_dir)])
    assert r1.returncode == 0, r1.stderr[-3000:]
    r2 = run_cli(base + ["--feature_dir", str(batch_dir), "--pairs_per_batch", "2"])
    assert r2.returncode == 0, r2.stderr[-3000:]
    singles = sorted(single_dir.glob("*.npz"))
    assert len(singles) == 3
    for f in singles:
        a = np.load(f)
        b = np.load(batch_dir / f.name)
        np.testing.assert_allclose(
            a["estimated_transform"], b["estimated_transform"], atol=1e-4
        )
        np.testing.assert_array_equal(a["corr_valid"], b["corr_valid"])
        np.testing.assert_array_equal(a["node_masks"], b["node_masks"])


@pytest.mark.slow
def test_train_loop_detection_cli(tmp_path, rng):
    """LD training CLI (reference trainval_loop_detection analogue): one
    epoch over synthetic tuples, chunked dispatch, snapshot written."""
    root, _ = make_kitti_tree(tmp_path, rng, n_frames=5)
    tuple_file = tmp_path / "tuples.npz"
    np.savez(
        tuple_file,
        anc_idx=np.array([0, 1, 2, 3]),
        pos_idx=np.array([1, 2, 3, 4]),
        neg_idx=np.array([3, 4, 0, 1]),
    )
    out = tmp_path / "ld"
    r = run_cli(
        [
            "experiments/train_loop_detection.py",
            "--dataset_root", str(root),
            "--seq", "8",
            "--tuple_file", str(tuple_file),
            "--output", str(out),
            "--train_mode", "frozen",
            "--num_pos", "1",
            "--num_neg", "1",
            "--max_epoch", "1",
            "--chunk", "2",
        ]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert (out / "snapshots").is_dir()
    assert any((out / "snapshots").iterdir())
    log = (out / "logs" / "train.log").read_text()
    assert "epoch 1/1" in log and "nan" not in log.lower().replace("nan_", "")


@pytest.mark.slow
def test_train_loop_detection_half_stream_matches_resident(tmp_path, rng):
    """Streaming half mode (host-RAM cache, per-dispatch mini-cache — the
    sequence-scale path where the stage-4 dumps exceed HBM) must produce
    the same training trajectory as the device-resident cache."""
    root, _ = make_kitti_tree(tmp_path, rng, n_frames=4)
    feat_dir = tmp_path / "features"
    r = run_cli(
        ["experiments/preextract_features.py", "--dataset_root", str(root),
         "--seq", "8", "--output", str(feat_dir)]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    tuple_file = tmp_path / "tuples.npz"
    np.savez(
        tuple_file,
        anc_idx=np.array([0, 1, 2]),
        pos_idx=np.array([1, 2, 3]),
        neg_idx=np.array([3, 3, 0]),
    )
    outs = {}
    for mode, budget in (("resident", "1e12"), ("stream", "1")):
        out = tmp_path / f"ld_{mode}"
        r = run_cli(
            [
                "experiments/train_loop_detection.py",
                "--dataset_root", str(root), "--seq", "8",
                "--tuple_file", str(tuple_file), "--output", str(out),
                "--train_mode", "half", "--feature_dir", str(feat_dir),
                "--num_pos", "1", "--num_neg", "1",
                "--max_epoch", "1", "--chunk", "2",
            ],
            env_extra={"LCRNET_HALF_CACHE_HBM_BUDGET": budget},
        )
        assert r.returncode == 0, r.stderr[-3000:]
        log = (out / "logs" / "train.log").read_text()
        assert ("STREAMING" in log) == (mode == "stream"), log[-500:]
        line = [l for l in log.splitlines() if "epoch 1/1" in l][-1]
        outs[mode] = line.split("loss:")[-1].strip()
    assert outs["resident"] == outs["stream"], outs


def test_generate_pairs_cli(tmp_path, rng):
    """experiments/generate_pairs.py produces every reference GT artifact
    (registration text, loop/mixed npz rows, overlap npz) from a KITTI-layout
    tree, each parseable by the matching loader."""
    root = tmp_path / "kitti"
    seq_dir = root / "downsampled_xyzi" / "00"
    seq_dir.mkdir(parents=True)
    n = 300
    poses = np.tile(np.eye(4), (n, 1, 1))
    for i in range(n):  # two laps of a 20 m circle: revisits at lap = 150
        a = 4 * np.pi * i / n
        poses[i, 0, 3] = 20.0 * np.cos(a)
        poses[i, 1, 3] = 20.0 * np.sin(a)
        c, s = np.cos(a), np.sin(a)
        poses[i, :3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    np.savetxt(root / "poses.txt", poses[:, :3, :4].reshape(n, 12))
    base = (rng.random((400, 3)) * [8.0, 8.0, 1.0]).astype(np.float32)
    for i in range(n):
        np.save(seq_dir / f"{i:06d}.npy", base)

    r = run_cli(
        [
            "experiments/generate_pairs.py",
            "--dataset_root", str(root),
            "--seq", "0",
            "--pose_file", str(root / "poses.txt"),
            "--tasks", "registration,loop,mixed,overlap",
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]

    from lcrnet_tpu.data.kitti import load_pair_npz_mixed, load_pair_text

    reg = load_pair_text(str(root / "icp10" / "00"))
    assert len(reg) > 5
    pos = poses[:, :3, 3]
    for p in reg:
        # reference semantics: pos = frame BEFORE the first one beyond 10 m
        assert np.linalg.norm(pos[p["pos_idx"]] - pos[p["anc_idx"]]) <= 10.0
        assert np.linalg.norm(pos[p["pos_idx"] + 1] - pos[p["anc_idx"]]) > 10.0

    loops = load_pair_npz_mixed(str(root / "loop_distance4" / "00.npz"))
    assert loops and all(q["anc_idx"] - q["pos_idx"] >= 50 for q in loops)

    mixed = load_pair_npz_mixed(str(root / "mixed" / "00.npz"))
    assert len(mixed) > len(reg)

    sys.path.insert(0, os.path.join(ROOT, "experiments"))
    from test_loop_detection import load_overlap_gt

    gt = load_overlap_gt(str(root / "loop_gt_seq00_0.3overlap.npz"), n)
    hits = [(i, js) for i, js in enumerate(gt) if js]
    assert hits  # identical scans at lap revisits overlap fully
    for i, js in hits:
        assert all(i - j > 100 for j in js)
