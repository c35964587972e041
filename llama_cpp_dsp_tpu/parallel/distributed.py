"""Multi-host SPMD launch.

TPU-native replacement for the reference's ggml-rpc distributed backend
(ggml/src/ggml-rpc/ggml-rpc.cpp + examples/rpc/rpc-server.cpp): instead of a
client proxying graph splits to worker daemons over TCP, every host runs the
SAME program; jax.distributed wires the hosts into one runtime and the
("dp","tp") mesh spans all chips, with GSPMD inserting collectives over
ICI (intra-slice) / DCN (inter-slice). The weight upload/dedup machinery of
the RPC backend dissolves: each host mmaps the GGUF locally and device_puts
only its own shards (jax.Array single-controller semantics).

Launch (2 hosts):
    host0: python -m llama_cpp_dsp_tpu.serve.server -m m.gguf \
               --coordinator host0:1234 --num-hosts 2 --host-id 0
    host1: same with --host-id 1
or rely on TPU pod metadata (no flags needed on Cloud TPU).
"""

from __future__ import annotations

import logging

log = logging.getLogger(__name__)


def init_distributed(coordinator: str | None = None, num_hosts: int | None = None,
                     host_id: int | None = None) -> int:
    """Initialize jax.distributed (idempotent). Returns this host's index.

    On Cloud TPU pods, jax.distributed.initialize() autodetects everything;
    explicit args cover manual clusters (the rpc-server workflow)."""
    import jax

    try:
        if coordinator:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_hosts,
                process_id=host_id,
            )
        elif num_hosts and num_hosts > 1:
            jax.distributed.initialize()
    except RuntimeError as e:  # already initialized
        log.debug("jax.distributed: %s", e)
    return jax.process_index()


def global_mesh(tp: int | None = None, dp: int | None = None):
    """Mesh over ALL devices across hosts. Defaults: tp = chips per host
    (ICI-local tensor parallelism), dp = number of hosts (DCN-friendly data
    parallelism) — the layout the scaling book prescribes: heavy collectives
    ride ICI, only gradient/batch-level traffic crosses DCN."""
    import jax
    from .sharding import ShardingConfig, make_mesh

    n = len(jax.devices())
    if tp is None:
        tp = max(1, jax.local_device_count())
    if dp is None:
        dp = max(1, n // tp)
    sc = ShardingConfig(tp=tp, dp=dp)
    return make_mesh(sc), sc
