"""Multi-host SPMD smoke: two real processes join via jax.distributed
(parallel/distributed.init_distributed — the ggml-rpc replacement, server
--coordinator workflow) and run ONE tensor-parallel decode step over a mesh
spanning both processes. Asserts both hosts compute identical logits.

This upgrades the multi-host path from dryrun-compiled to actually
executed (2-process Gloo on CPU; a TPU pod runs the same code with
autodetected topology). Gotcha encoded here: on a 1-core host the two
processes compile at different times, and Gloo's collective-context init
has a fixed 30 s key-value timeout — so the workers barrier on the
coordination service after compiling, and exchange results through its KV
store rather than a second collective."""

import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import sys

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    import numpy as np

    pid = int(sys.argv[1])
    port = sys.argv[2]
    from llama_cpp_dsp_tpu.parallel.distributed import (
        global_mesh, init_distributed,
    )

    idx = init_distributed(f"127.0.0.1:{port}", num_hosts=2, host_id=pid)
    assert idx == pid, (idx, pid)
    mesh, sc = global_mesh(tp=2, dp=1)  # 2 procs x 1 local device

    sys.path.insert(0, "tests")
    from model_builder import build_tiny_llama

    from llama_cpp_dsp_tpu.runtime.loader import load_model

    # every host loads the same GGUF locally (the RPC upload dissolves)
    path = f"/tmp/dist_tiny_{port}.gguf"
    if pid == 0:
        build_tiny_llama(path, qtype=0)
    import os, time
    while not os.path.exists(path):
        time.sleep(0.5)
    time.sleep(1.0)
    model = load_model(path)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from llama_cpp_dsp_tpu.models.llama import forward
    from llama_cpp_dsp_tpu.parallel.sharding import shard_params
    from llama_cpp_dsp_tpu.runtime.kv_cache import KVCache, causal_mask

    cfg = model.cfg
    params = shard_params(model.params, cfg, mesh)
    cache = KVCache.create(cfg.n_layers, 1, 32, cfg.n_kv_heads, cfg.head_dim)
    repl = NamedSharding(mesh, P())
    cache = jax.tree.map(lambda a: jax.device_put(a, repl), cache)

    def _fwd(params, cache, toks, pos):
        mask = causal_mask(pos, cache.capacity, 0)
        return forward(params, cfg, toks, pos, cache, 0, mask,
                       compute_dtype=jnp.float32)

    # replicate outputs so each process can read the full logits locally
    step = jax.jit(_fwd, out_shardings=(repl, repl))

    toks = jax.device_put(jnp.asarray([[3, 5, 9, 2]], jnp.int32), repl)
    pos = jax.device_put(jnp.asarray([[0, 1, 2, 3]], jnp.int32), repl)
    compiled = step.lower(params, cache, toks, pos).compile()

    # barrier AFTER compile: execution's gloo context init has a 30 s
    # timeout, far shorter than a 1-core compile
    from jax._src import distributed as _dist
    client = _dist.global_state.client
    client.wait_at_barrier("compile_done", 600_000)

    logits, _ = compiled(params, cache, toks, pos)
    row = np.asarray(logits.addressable_shards[0].data)[0, -1, :8]
    # exchange through the coordination KV store (no second collective)
    client.key_value_set(f"logits_{pid}", ",".join(f"{v:.5f}" for v in row))
    peer = client.blocking_key_value_get(f"logits_{1 - pid}", 600_000)
    mine = ",".join(f"{v:.5f}" for v in row)
    assert peer == mine, (peer, mine)
    print("DIST_OK", pid, mine, flush=True)
    # after the sync barrier, skip the atexit shutdown handshake entirely:
    # its barrier has a short timeout and the two processes tear down at
    # different speeds on a 1-core host (observed flaking both ways)
    client.wait_at_barrier("done", 600_000)
    sys.stdout.flush()
    os._exit(0)
""")


# 2 processes x 4 virtual devices each: a (dp=2, tp=4) mesh whose dp axis
# spans the process (DCN) boundary while tp stays process-local (ICI) — the
# scaling-book layout. Exercises jax.distributed + GSPMD sharding on a mesh
# that is NOT one-device-per-process (the cross-host composition the
# reference reaches via ggml-rpc.cpp:79-95 one-model-across-hosts).
WORKER_DPTP = textwrap.dedent("""
    import os, sys, time

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    import numpy as np

    pid = int(sys.argv[1])
    port = sys.argv[2]
    from llama_cpp_dsp_tpu.parallel.distributed import (
        global_mesh, init_distributed,
    )

    idx = init_distributed(f"127.0.0.1:{port}", num_hosts=2, host_id=pid)
    assert idx == pid, (idx, pid)
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 8, jax.device_count()
    mesh, sc = global_mesh(tp=4, dp=2)  # dp spans processes, tp is local
    # dp must be the cross-process axis: each dp row's devices live on one
    # process (tp collectives never cross the process boundary)
    procs_per_dp_row = {
        d.process_index for d in np.asarray(mesh.devices)[pid].ravel()
    }
    assert procs_per_dp_row == {pid}, procs_per_dp_row

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from llama_cpp_dsp_tpu.gguf.constants import GGMLType
    from llama_cpp_dsp_tpu.models.llama import forward
    from llama_cpp_dsp_tpu.parallel.sharding import (
        activation_sharding, cache_sharding, shard_params,
    )
    from llama_cpp_dsp_tpu.runtime.kv_cache import KVCache, causal_mask
    from llama_cpp_dsp_tpu.tools.synth import synth_params, tiny_config

    cfg = tiny_config(n_heads=8, n_kv_heads=8)
    params = synth_params(cfg, GGMLType.Q4_0, seed=3)
    params = shard_params(params, cfg, mesh)  # cross-process device_put
    b, t, n_ctx = 2, 4, 32  # batch sharded over dp: one row per process
    cache = jax.device_put(
        KVCache.create(cfg.n_layers, b, n_ctx, cfg.n_kv_heads, cfg.head_dim),
        cache_sharding(mesh),
    )
    act = activation_sharding(mesh)
    toks_h = np.asarray([[3, 5, 9, 2], [7, 1, 4, 8]], np.int32)
    pos_h = np.broadcast_to(np.arange(t, dtype=np.int32), (b, t))
    tokens = jax.device_put(jnp.asarray(toks_h), act)
    positions = jax.device_put(jnp.asarray(pos_h.copy()), act)

    repl = NamedSharding(mesh, P())

    def _fwd(params, cache, toks, pos):
        mask = causal_mask(pos, cache.capacity, 0)
        return forward(params, cfg, toks, pos, cache, 0, mask,
                       compute_dtype=jnp.float32)

    step = jax.jit(_fwd, out_shardings=(repl, repl))
    compiled = step.lower(params, cache, tokens, positions).compile()

    from jax._src import distributed as _dist
    client = _dist.global_state.client
    client.wait_at_barrier("compile_done", 600_000)

    logits, _ = compiled(params, cache, tokens, positions)
    row = np.asarray(logits.addressable_shards[0].data)[:, -1, :8].ravel()
    client.key_value_set(f"dptp_logits_{pid}",
                         ",".join(f"{v:.5f}" for v in row))
    peer = client.blocking_key_value_get(f"dptp_logits_{1 - pid}", 600_000)
    mine = ",".join(f"{v:.5f}" for v in row)
    assert peer == mine, (peer, mine)
    print("DIST_OK", pid, mine, flush=True)
    client.wait_at_barrier("done", 600_000)
    sys.stdout.flush()
    os._exit(0)
""")


def _free_port() -> str:
    """OS-assigned free port (the old pid-derived choice collided across
    concurrent pytest runs and TIME_WAIT leftovers)."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return str(s.getsockname()[1])


def _run_two_procs(worker: str, n_local_devices: int, attempts: int = 2):
    import os

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}")
    last = None
    for attempt in range(attempts):
        port = _free_port()
        procs = [subprocess.Popen(
            [sys.executable, "-u", "-c", worker, str(i), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=".", env=env) for i in range(2)]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=850)
                outs.append(out)
        except subprocess.TimeoutExpired as e:
            for p in procs:
                p.kill()
            last = f"timeout: {e}"
            continue
        if all(p.returncode == 0 and "DIST_OK" in out
               for p, out in zip(procs, outs)):
            rows = sorted(line for out in outs for line in out.splitlines()
                          if line.startswith("DIST_OK"))
            assert rows[0].split(" ", 2)[2] == rows[1].split(" ", 2)[2]
            return
        last = "\n".join(f"proc {i} rc={p.returncode}:\n{out[-2500:]}"
                         for i, (p, out) in enumerate(zip(procs, outs)))
        # one retry: a cold compile under full-suite load on this 1-core
        # host can blow the distributed-init window
    raise AssertionError(last)


def test_two_process_dp_tp_mesh_decode():
    _run_two_procs(WORKER_DPTP, 4)


def test_two_process_tensor_parallel_decode(tmp_path):
    # conftest exports XLA_FLAGS=--xla_force_host_platform_device_count=8;
    # the workers must see ONE local device each (2 procs x 1 device mesh)
    _run_two_procs(WORKER, 1)
