"""Checkpoint / resume for the serving engine — weights + live KV-cache.

The reference persists nothing but benchmark logs (SURVEY.md §5); an
inference engine needs restartable state: model weights, the paged KV-cache
device arrays, the native allocator's page tables, and the host-side request
bookkeeping. A snapshot taken between engine steps (the quiesce point — the
engine loop is synchronous, so any point outside :meth:`Engine.step` is
quiescent) restores to an engine that continues decoding the same requests
with bit-identical cache contents.

Arrays (params + per-layer caches) go through orbax; host state (request
queues, allocator tables, RNG) is JSON.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from tpu_flash.cache.paged_cache import CacheConfig
from tpu_flash.models import transformer as tfm
from tpu_flash.serving.engine import Engine, EngineConfig, FinishedRequest, Request, _Running

_HOST_STATE = "host_state.json"
_CACHE_ARRAYS = ("k_pages", "v_pages", "k_scales", "v_scales", "page_tables", "lengths")
_ARRAYS = "arrays"


def _running_to_dict(r: _Running) -> dict:
    return dataclasses.asdict(r)


def save_checkpoint(path: str, engine: Engine) -> None:
    """Snapshot the engine (weights, caches, allocator, queues) to ``path``.

    Must be called between engine steps (not re-entrantly from a hook).
    """
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    if getattr(engine, "prefilling", None):
        raise ValueError(
            "cannot snapshot with chunked prefills in flight; step the "
            "engine until engine.prefilling is empty"
        )
    engine.flush()  # commit any async decode round before snapshotting

    arrays = {
        "params": engine.params,
        "caches": [
            {f: getattr(c, f) for f in _CACHE_ARRAYS if getattr(c, f) is not None}
            for c in engine.caches
        ],
    }
    # Convert to host np arrays; orbax handles the rest. np.asarray on a
    # non-fully-addressable array (multi-host TP) would raise mid-write, so
    # check up front with a clear message (single-host meshes — including
    # every virtual-device test mesh — are always fully addressable).
    for leaf in jax.tree_util.tree_leaves(arrays):
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            raise ValueError(
                "save_checkpoint requires fully-addressable arrays; "
                "multi-host shardings need a distributed (orbax sharded) "
                "save path"
            )
    arrays = jax.tree_util.tree_map(np.asarray, arrays)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.join(path, _ARRAYS), arrays, force=True)

    alloc_tables = {
        str(slot): engine._alloc.table(slot)[: engine._alloc.num_pages(slot)].tolist()
        for slot in engine.running
    }
    host = {
        "model_cfg": dataclasses.asdict(engine.mcfg),
        "cache_cfg": dataclasses.asdict(engine.ccfg),
        "engine_cfg": {
            **dataclasses.asdict(engine.ecfg),
            "prefill_buckets": list(engine.ecfg.prefill_buckets),
        },
        "waiting": [dataclasses.asdict(r) for r in engine.waiting],
        "running": {str(s): _running_to_dict(r) for s, r in engine.running.items()},
        "finished": [dataclasses.asdict(f) for f in engine.finished],
        "free_slots": list(engine._free_slots),
        "alloc_tables": alloc_tables,
        "rng_state": engine._rng.bit_generator.state,
        "sample_key": np.asarray(engine._key).tolist(),
        "tensor_parallel": engine.mesh is not None,
    }
    def _np_default(o):
        if isinstance(o, np.integer):
            return int(o)
        if isinstance(o, np.floating):
            return float(o)
        raise TypeError(f"not JSON serializable: {type(o)}")

    with open(os.path.join(path, _HOST_STATE), "w") as f:
        json.dump(host, f, default=_np_default)


def load_checkpoint(path: str, mesh=None, tp_axis: str = "model",
                    draft=None) -> Engine:
    """Rebuild an engine from :func:`save_checkpoint` output and resume.

    A snapshot taken from a tensor-parallel engine must be restored with a
    ``mesh`` (the params/caches may not fit, and the topology silently
    changing is never what the operator wants).

    ``draft``: (draft_params, draft ModelConfig) — REQUIRED when the
    snapshot's EngineConfig has speculate_k > 0 (draft weights are the
    operator's to supply, like the mesh; silently resuming without one
    would quietly decode plain). Restored running sequences have no draft
    K/V — the first speculative round's catch-up feeds replay their
    histories through the draft.
    """
    path = os.path.abspath(path)
    with open(os.path.join(path, _HOST_STATE)) as f:
        host = json.load(f)

    if host.get("tensor_parallel") and mesh is None:
        raise ValueError(
            "checkpoint was saved from a tensor-parallel engine; pass the "
            "mesh to restore with (load_checkpoint(path, mesh=...))"
        )

    mcfg = tfm.ModelConfig(**host["model_cfg"])
    ccfg = CacheConfig(**host["cache_cfg"])
    ecfg_d = dict(host["engine_cfg"])
    ecfg_d["prefill_buckets"] = tuple(ecfg_d["prefill_buckets"])
    ecfg = EngineConfig(**ecfg_d)

    ckpt = ocp.PyTreeCheckpointer()
    arrays = ckpt.restore(os.path.join(path, _ARRAYS))

    if ecfg.speculate_k > 0 and draft is None:
        raise ValueError(
            f"checkpoint was saved with speculate_k={ecfg.speculate_k}; "
            "pass draft=(params, cfg) to restore speculative decoding "
            "(resuming without one would silently decode plain)")
    engine = Engine(arrays["params"], mcfg, ccfg, ecfg, mesh=mesh,
                    tp_axis=tp_axis, draft=draft)
    # Overwrite freshly-created caches with the snapshot (page tables,
    # lengths, scales and data all live in the pytree).
    import jax.numpy as jnp

    if mesh is not None:
        # Re-install the TP sharding on the restored arrays immediately
        # (device_put with the cache pspecs) instead of leaving them
        # unsharded until the first jit dispatch reshards them.
        from jax.sharding import NamedSharding
        from tpu_flash.parallel.shardings import cache_pspecs

        def _restore_cache(i):
            specs = cache_pspecs(engine.caches[i], tp_axis)
            return dataclasses.replace(
                engine.caches[i],
                **{
                    k: jax.device_put(
                        jnp.asarray(v), NamedSharding(mesh, getattr(specs, k))
                    )
                    for k, v in arrays["caches"][i].items()
                },
            )

        engine.caches = [_restore_cache(i) for i in range(mcfg.num_layers)]
    else:
        engine.caches = [
            dataclasses.replace(
                engine.caches[i],
                **{k: jnp.asarray(v) for k, v in arrays["caches"][i].items()},
            )
            for i in range(mcfg.num_layers)
        ]

    from collections import deque

    engine.waiting = deque(Request(**r) for r in host["waiting"])
    engine.running = {
        int(s): _Running(**r) for s, r in host["running"].items()
    }
    engine.finished = [FinishedRequest(**f) for f in host["finished"]]
    engine._free_slots = deque(host["free_slots"])
    for s, table in host["alloc_tables"].items():
        if not engine._alloc.restore(int(s), table):
            raise RuntimeError(f"allocator restore failed for slot {s}")
    if draft is not None:
        # the target caches' page tables came back inside the snapshot,
        # but the freshly-created DRAFT caches' tables are all zeros (the
        # trash page) — without a sync the first speculative round's
        # catch-up replay writes every history into page 0 and acceptance
        # silently collapses. Sync re-derives both from the allocator.
        for s in host["alloc_tables"]:
            engine._sync_slot_tables(int(s))
    engine._rng.bit_generator.state = host["rng_state"]
    engine._key = jnp.asarray(np.asarray(host["sample_key"], np.uint32))
    return engine
