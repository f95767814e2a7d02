"""Multi-host launch path: two-process CPU Gloo smoke test for
`parallel.mesh.setup_distributed` (the reference's torch.distributed/NCCL
process-group analogue, `base_trainer.py:64-87`)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)  # one local device per process
    sys.path.insert(0, os.environ["LCRNET_REPO"])
    import jax
    jax.config.update("jax_platforms", "cpu")

    from lcrnet_tpu.parallel.mesh import make_mesh, process_local_batch_slice, setup_distributed

    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    assert setup_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(dp=nproc, mp=1)
    sl = process_local_batch_slice(nproc)
    assert sl == slice(pid, pid + 1)

    # dp-sharded global batch, gradient-mean psum across processes
    local = np.full((1, 4), float(pid + 1), np.float32)
    batch = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(("dp", "mp"))), local
    )
    w = jnp.ones((4,))

    def loss(w, b):
        return jnp.mean((b @ w) ** 2)

    g = jax.jit(jax.grad(loss), out_shardings=NamedSharding(mesh, P()))(w, batch)
    print("GRAD0", float(np.asarray(g)[0]))
    """
)


def test_two_process_gloo_gradient_agreement(tmp_path):
    if sys.platform != "linux":
        pytest.skip("gloo smoke test is linux-only")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["LCRNET_REPO"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    grads = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("GRAD0")][0]
        grads.append(float(line.split()[1]))
    # both processes see the same global gradient: mean over global batch
    # [1,1,1,1] and [2,2,2,2] -> d/dw0 mean((b@w)^2) = mean(2*(b@w)*b0) = (2*4*1 + 2*8*2)/2
    assert abs(grads[0] - grads[1]) < 1e-6
    assert abs(grads[0] - (2 * 4 * 1 + 2 * 8 * 2) / 2) < 1e-4
