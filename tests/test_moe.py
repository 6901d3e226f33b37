"""MoE MLP + expert parallelism: routing invariants, agreement with a
per-token reference loop, model integration (forward/decode parity), and
EP sharding over an `expert` mesh axis producing identical results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.models import moe
from tpu_flash.models import transformer as tfm


def _h(rng, b, n, d):
    return jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)


def _layer(rng, d=32, hidden=64, e=4):
    key = jax.random.PRNGKey(int(rng.integers(1 << 30)))
    return moe.init_moe_params(key, d, hidden, e, jnp.float32)


def _moe_reference(layer, h, top_k, capacity):
    """Per-token python-loop reference: same priority-order capacity
    semantics as route_topk, experts applied one token at a time."""
    b, n, d = h.shape
    e = layer["w_gate"].shape[0]
    logits = np.asarray(h.astype(jnp.float32) @ layer["wr"])
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    out = np.zeros((b, n, d), np.float32)
    for bi in range(b):
        fill = np.zeros(e, np.int64)
        choices = {}  # (token, expert) -> kept?
        # choice order 0 for all tokens first, then choice 1 (priority)
        picks = []
        p = probs[bi].copy()
        for kk in range(top_k):
            idx = p.argmax(-1)
            for t in range(n):
                picks.append((kk, t, int(idx[t]), probs[bi, t, idx[t]]))
            p[np.arange(n), idx] = -1.0
        kept = []
        for kk in range(top_k):
            # GShard semantics: later choices offset by the POST-truncation
            # fill of earlier choices, but positions within one choice come
            # from that choice's raw running count (a dropped token still
            # advances its own choice's counter).
            round_fill = np.zeros(e, np.int64)
            for t in range(n):
                _, _, ex, g = picks[kk * n + t]
                if fill[ex] + round_fill[ex] < capacity:
                    kept.append((t, ex, g))
                round_fill[ex] += 1
            for ex in range(e):
                fill[ex] += min(round_fill[ex], capacity - fill[ex])
        denom = np.zeros(n, np.float64)
        for t, ex, g in kept:
            denom[t] += g
        for t, ex, g in kept:
            x = np.asarray(h[bi, t], np.float64)
            wg = np.asarray(layer["w_gate"][ex], np.float64)
            wu = np.asarray(layer["w_up"][ex], np.float64)
            wd = np.asarray(layer["w_down"][ex], np.float64)
            gate = x @ wg
            act = gate / (1 + np.exp(-gate)) * (x @ wu)
            out[bi, t] += (g / denom[t]) * (act @ wd)
    return out


@pytest.mark.parametrize("top_k", [1, 2])
def test_route_topk_invariants(rng, top_k):
    h = _h(rng, 2, 64, 16)
    wr = jnp.asarray(rng.standard_normal((16, 4)), jnp.float32)
    logits = h @ wr
    cap = 64  # ample: nothing dropped
    dispatch, combine, aux = moe.route_topk(logits, top_k, cap)
    d, c = np.asarray(dispatch), np.asarray(combine)
    # each token dispatched to exactly top_k slots, each slot used once
    assert np.allclose(d.sum(axis=(2, 3)), top_k)
    assert d.max() == 1.0 and (d.sum(axis=(1,)) <= 1.0 + 1e-6).all()
    # combine weights sum to 1 per token
    assert np.allclose(c.sum(axis=(2, 3)), 1.0, atol=1e-5)
    assert float(aux) > 0


def test_route_topk_capacity_drops(rng):
    # every token's top choice is expert 0 → only `capacity` of them fit
    logits = jnp.broadcast_to(
        jnp.asarray([10.0, 0.0, 0.0, 0.0], jnp.float32), (1, 32, 4))
    dispatch, combine, _ = moe.route_topk(logits, 1, capacity=8)
    d = np.asarray(dispatch)
    assert d.sum() == 8  # only 8 tokens fit
    # dropped tokens have zero combine weight
    assert np.asarray(combine).sum(axis=(2, 3)).max() <= 1.0 + 1e-6


@pytest.mark.parametrize("top_k", [1, 2])
def test_moe_mlp_matches_reference(rng, top_k):
    layer = _layer(rng)
    h = _h(rng, 2, 48, 32)
    out, aux = moe.moe_mlp(layer, h, top_k=top_k, capacity_factor=1.25)
    n, e = 48, 4
    cap = int(np.ceil(top_k * n / e * 1.25))
    ref = _moe_reference(layer, h, top_k, cap)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-3)


def test_moe_model_forward_and_grad(rng):
    cfg = tfm.ModelConfig(
        vocab_size=64, dim=32, num_layers=2, num_q_heads=2, num_kv_heads=2,
        head_dim=16, mlp_hidden=64, block_q=128, block_kv=128,
        dtype="float32", moe_experts=4, moe_top_k=2,
    )
    params = tfm.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray(rng.integers(0, 64, (2, 65)), jnp.int32)
    loss, grads = jax.value_and_grad(tfm.loss_fn)(params, tokens, cfg)
    assert np.isfinite(float(loss))
    gnorm = float(jnp.sqrt(sum(
        jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grads))))
    assert np.isfinite(gnorm) and gnorm > 0
    # router gets gradient (the combine weights carry it)
    assert float(jnp.max(jnp.abs(grads["layers"][0]["wr"]))) > 0


def test_moe_decode_matches_forward(rng):
    """Greedy decode through the paged cache must match teacher-forced
    forward on an MoE model (same parity gate the dense model has).

    Uses the drop-free capacity factor (cf >= E/top_k): capacity drops are
    batch-dependent (a token that overflows in the batched forward routes
    alone during decode), so prefix-consistent serving requires cf that
    guarantees zero drops — see moe.py docstring."""
    from tpu_flash.cache.paged_cache import CacheConfig, PagedKVCache

    cfg = tfm.ModelConfig(
        vocab_size=64, dim=32, num_layers=2, num_q_heads=2, num_kv_heads=2,
        head_dim=16, mlp_hidden=64, block_q=128, block_kv=128,
        dtype="float32", moe_experts=4, moe_top_k=2,
        moe_capacity_factor=2.0,
    )
    params = tfm.init_params(jax.random.PRNGKey(0), cfg)
    prompt = jnp.asarray(rng.integers(0, 64, (1, 8)), jnp.int32)

    logits_full = tfm.forward(params, prompt, cfg)

    ccfg = CacheConfig(num_kv_heads=2, head_dim=16, page_size=8,
                       total_pages=16, max_seqs=2, max_pages_per_seq=4,
                       dtype="float32")
    caches = [PagedKVCache.create(ccfg) for _ in range(cfg.num_layers)]
    pt = jnp.zeros((ccfg.max_seqs, ccfg.max_pages_per_seq), jnp.int32)
    pt = pt.at[0, :2].set(jnp.asarray([1, 2], jnp.int32))
    caches = [c.assign_pages(pt) for c in caches]
    logits_pre, kv = tfm.prefill(params, prompt, cfg)
    for i, (k, v) in enumerate(kv):
        caches[i] = caches[i].write_prompt(0, jnp.swapaxes(k[0], 0, 1),
                                           jnp.swapaxes(v[0], 0, 1))
    np.testing.assert_allclose(
        np.asarray(logits_pre[0]), np.asarray(logits_full[0, -1]),
        atol=2e-4, rtol=1e-3,
    )
    # one decode step == forward at position 8
    tok = jnp.argmax(logits_pre[0])[None].astype(jnp.int32)
    ext = jnp.concatenate([prompt, tok[None]], axis=1)
    logits_ext = tfm.forward(params, ext, cfg)
    step_logits, caches = tfm.decode_step(
        params, tok, jnp.asarray([8], jnp.int32), caches,
        jnp.asarray([0], jnp.int32), cfg)
    # decode runs attention through the paged kernel (vs flash in forward);
    # the expert matmuls amplify that path difference, so the logit gate is
    # looser here — the serving-critical invariant is the greedy token.
    np.testing.assert_allclose(
        np.asarray(step_logits[0]), np.asarray(logits_ext[0, -1]),
        atol=2e-3, rtol=2e-2,
    )
    assert int(jnp.argmax(step_logits[0])) == int(jnp.argmax(logits_ext[0, -1]))


def test_moe_engine_generates(rng):
    """Continuous-batching engine end-to-end on an MoE model (drop-free
    capacity factor): generation completes and is deterministic."""
    from tpu_flash.cache.paged_cache import CacheConfig
    from tpu_flash.serving.engine import Engine, EngineConfig, Request

    cfg = tfm.ModelConfig(
        vocab_size=256, dim=64, num_layers=2, num_q_heads=2, num_kv_heads=2,
        head_dim=32, mlp_hidden=128, block_q=128, block_kv=128,
        dtype="float32", moe_experts=4, moe_top_k=2, moe_capacity_factor=2.0)
    params = tfm.init_params(jax.random.PRNGKey(0), cfg)
    ccfg = CacheConfig(num_kv_heads=2, head_dim=32, page_size=16,
                       total_pages=64, max_seqs=4, max_pages_per_seq=8,
                       dtype="float32")

    prompts = [list(rng.integers(1, 255, 6)), [3, 1, 4, 1, 5, 9, 2, 6]]

    def run():
        eng = Engine(params, cfg, ccfg, EngineConfig(max_batch=2))
        for rid, p in enumerate(prompts):
            eng.submit(Request(rid=rid, prompt=p, max_new_tokens=6))
        return sorted((f.rid, tuple(f.new_tokens)) for f in eng.run())

    out1 = run()
    assert all(len(t) == 6 for _, t in out1)
    assert out1 == run()  # deterministic


def test_route_topk_rejects_topk_over_experts(rng):
    logits = jnp.zeros((1, 4, 2), jnp.float32)
    with pytest.raises(ValueError, match="top_k"):
        moe.route_topk(logits, 3, capacity=4)


def test_dropped_first_choice_frees_slot_for_second_choice():
    """GShard post-truncation offsets: choice-0 drops must not waste the
    capacity slots a choice-1 token could fill."""
    # 2 experts; all 8 tokens pick expert 0 first (logit 10) and expert 1
    # second. capacity=4: choice-0 fills expert-0 slots 0-3 (4 dropped);
    # choice-1 fills expert-1 slots 0-3 (4 dropped). Expert 1's slots must
    # start at 0 even though 8 choice-0 picks of expert 0 preceded them.
    logits = jnp.broadcast_to(jnp.asarray([10.0, 0.0], jnp.float32), (1, 8, 2))
    dispatch, _, _ = moe.route_topk(logits, 2, capacity=4)
    d = np.asarray(dispatch)
    assert d[..., 0, :].sum() == 4        # expert 0: 4 kept
    assert d[..., 1, :].sum() == 4        # expert 1: choice-1 tokens kept
    # expert 1 slots 0..3 each used exactly once (no pre-drop offset)
    assert np.allclose(d[0, :, 1, :].sum(axis=0), 1.0)


def test_serving_guard_rejects_dropful_capacity():
    cfg = tfm.ModelConfig(
        vocab_size=64, dim=32, num_layers=1, num_q_heads=2, num_kv_heads=2,
        head_dim=16, mlp_hidden=64, dtype="float32",
        moe_experts=8, moe_top_k=2, moe_capacity_factor=1.25)
    params = tfm.init_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="drop-free"):
        tfm.prefill(params, jnp.zeros((1, 8), jnp.int32), cfg)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_moe_expert_parallel_sharding(rng):
    """EP: expert-major weights sharded over an `expert` mesh axis give the
    SAME outputs and gradients as unsharded execution (XLA inserts the
    collectives around the dispatch einsums)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    layer = _layer(rng, d=32, hidden=64, e=8)
    h = _h(rng, 2, 64, 32)
    out_ref, aux_ref = moe.moe_mlp(layer, h, top_k=2)

    mesh = Mesh(np.array(jax.devices()[:4]), ("expert",))
    specs = moe.expert_pspecs()
    sharded = {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in layer.items()
    }

    @jax.jit
    def f(layer, h):
        out, aux = moe.moe_mlp(layer, h, top_k=2)
        return out, aux

    out_s, aux_s = f(sharded, jax.device_put(h, NamedSharding(mesh, P())))
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_ref),
                               atol=1e-5, rtol=1e-5)
    assert abs(float(aux_s) - float(aux_ref)) < 1e-6

    def loss(layer, h):
        out, aux = moe.moe_mlp(layer, h, top_k=2)
        return jnp.sum(out ** 2) + 0.01 * aux

    g_ref = jax.grad(loss)(layer, h)
    g_s = jax.jit(jax.grad(loss))(sharded, h)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_s[k]), np.asarray(g_ref[k]),
                                   atol=1e-5, rtol=1e-4)
