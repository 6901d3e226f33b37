"""Failure detection + restart-from-checkpoint recovery (serving/supervisor).

The reference has no serving runtime; SURVEY.md §5 lists failure
detection / elastic recovery as ours to build. These tests drive the
supervised engine loop through injected crashes and external kills and
require the recovered run to produce exactly the tokens of an
uninterrupted run (the determinism contract from tests/test_checkpoint).
"""

import dataclasses

import numpy as np
import jax
import pytest

from tpu_flash.cache.paged_cache import CacheConfig
from tpu_flash.models import transformer as tfm
from tpu_flash.serving.engine import Engine, EngineConfig, Request
from tpu_flash.serving.supervisor import Supervisor, SupervisorConfig

_MCFG = tfm.ModelConfig(
    vocab_size=256,
    dim=128,
    num_layers=2,
    num_q_heads=4,
    num_kv_heads=2,
    head_dim=32,
    block_q=128,
    block_kv=128,
)

_CCFG = CacheConfig(
    num_kv_heads=_MCFG.num_kv_heads,
    head_dim=_MCFG.head_dim,
    page_size=16,
    total_pages=128,
    max_seqs=8,
    max_pages_per_seq=16,
    dtype="float32",
)

_PROMPTS = [
    [int(t) for t in np.random.default_rng(i).integers(1, 255, 10 + 3 * i)]
    for i in range(3)
]


@pytest.fixture(scope="module")
def params():
    return tfm.init_params(jax.random.PRNGKey(0), _MCFG)


def _make_engine(params):
    return Engine(params, _MCFG, _CCFG, EngineConfig(max_batch=4))


def _reference_tokens(params):
    eng = _make_engine(params)
    for rid, p in enumerate(_PROMPTS):
        eng.submit(Request(rid=rid, prompt=p, max_new_tokens=12))
    return sorted((f.rid, tuple(f.tokens)) for f in eng.run())


def _submit_all(sup):
    for rid, p in enumerate(_PROMPTS):
        sup.submit(Request(rid=rid, prompt=p, max_new_tokens=12))


def test_supervised_run_matches_plain_engine(tmp_path, params):
    """No faults: the supervisor is a transparent wrapper."""
    sup = Supervisor(
        lambda: _make_engine(params),
        SupervisorConfig(dir=str(tmp_path / "sup"), checkpoint_every=4),
    )
    _submit_all(sup)
    done = sorted((f.rid, tuple(f.tokens)) for f in sup.run())
    assert done == _reference_tokens(params)


@pytest.mark.parametrize("crash_step", [2, 6])
def test_crash_recovery_exact(tmp_path, params, crash_step):
    """A one-shot injected crash (before AND after the first snapshot)
    recovers to exactly the uninterrupted tokens."""
    fired = []

    def fault(step, engine):
        if step == crash_step and not fired:
            fired.append(step)
            raise RuntimeError("injected device failure")

    sup = Supervisor(
        lambda: _make_engine(params),
        SupervisorConfig(
            dir=str(tmp_path / "sup"), checkpoint_every=4, fault_hook=fault
        ),
    )
    _submit_all(sup)
    done = sorted((f.rid, tuple(f.tokens)) for f in sup.run())
    assert fired, "fault hook never fired"
    assert sup.restarts == 1
    assert done == _reference_tokens(params)


def test_external_kill_resume(tmp_path, params):
    """Simulate an external process kill after a snapshot: a brand-new
    Supervisor on the same directory resumes and finishes exactly."""
    d = str(tmp_path / "sup")
    sup = Supervisor(
        lambda: _make_engine(params),
        SupervisorConfig(dir=d, checkpoint_every=4),
    )
    _submit_all(sup)
    sup.run(max_steps=6)  # past the step-4 snapshot, then "killed"
    del sup

    sup2 = Supervisor(
        lambda: _make_engine(params), SupervisorConfig(dir=d, checkpoint_every=4)
    )
    assert sup2.step_index == 4  # resumed from the snapshot, not fresh
    done = sorted((f.rid, tuple(f.tokens)) for f in sup2.resume())
    assert done == _reference_tokens(params)


def test_kill_before_first_checkpoint_replays_journal(tmp_path, params):
    """A kill before any snapshot exists must not lose accepted requests:
    the journal replays them into a fresh engine."""
    d = str(tmp_path / "sup")
    sup = Supervisor(
        lambda: _make_engine(params),
        SupervisorConfig(dir=d, checkpoint_every=1000),
    )
    _submit_all(sup)
    sup.run(max_steps=2)  # killed before any checkpoint
    del sup

    sup2 = Supervisor(
        lambda: _make_engine(params),
        SupervisorConfig(dir=d, checkpoint_every=1000),
    )
    done = sorted((f.rid, tuple(f.tokens)) for f in sup2.resume())
    assert done == _reference_tokens(params)


def test_health_check_catches_corrupt_tokens(tmp_path, params):
    """An out-of-vocab token (corrupt device state) is detected and the
    engine recovers; persistent corruption exhausts max_restarts."""
    sup = Supervisor(
        lambda: _make_engine(params),
        SupervisorConfig(dir=str(tmp_path / "sup"), max_restarts=2),
    )
    _submit_all(sup)
    sup.run(max_steps=3)

    def corrupt(step, engine):
        for r in engine.running.values():
            r.tokens[-1] = _MCFG.vocab_size + 7  # out of vocab
            break

    # persistent corruption: every post-step health check raises
    sup.cfg = dataclasses.replace(sup.cfg, fault_hook=None)
    orig = sup._check_health

    def failing_check():
        corrupt(sup.step_index, sup.engine)
        orig()

    sup._check_health = failing_check
    with pytest.raises(RuntimeError, match="max_restarts"):
        sup.run()


def test_checkpoint_rotation(tmp_path, params):
    """Only keep_checkpoints trailing snapshot dirs are retained."""
    import os

    d = str(tmp_path / "sup")
    sup = Supervisor(
        lambda: _make_engine(params),
        SupervisorConfig(dir=d, checkpoint_every=2, keep_checkpoints=2),
    )
    _submit_all(sup)
    sup.run()
    snaps = sorted(x for x in os.listdir(d) if x.startswith("step_"))
    assert len(snaps) <= 2
    with open(os.path.join(d, "LATEST")) as f:
        assert f.read().strip() == snaps[-1]


def test_crash_recovery_with_speculation(tmp_path, params):
    """Recovery re-attaches the draft (Supervisor(draft=...)): the
    restored speculative engine reproduces the uninterrupted greedy
    stream exactly — including sequences that were mid-generation when
    the crash hit (their draft caches replay through catch-up feeds)."""
    fired = []

    def fault(step, engine):
        if step == 3 and not fired:
            fired.append(step)
            raise RuntimeError("injected device failure")

    def make():
        return Engine(params, _MCFG, _CCFG,
                      EngineConfig(max_batch=4, speculate_k=3),
                      draft=(params, _MCFG))

    sup = Supervisor(
        make,
        SupervisorConfig(
            dir=str(tmp_path / "sup"), checkpoint_every=2, fault_hook=fault
        ),
        draft=(params, _MCFG),
    )
    _submit_all(sup)
    done = sorted((f.rid, tuple(f.tokens)) for f in sup.run())
    assert fired and sup.restarts == 1
    assert done == _reference_tokens(params)
    # the draft caches' page tables must be re-synced on restore: a
    # self-draft accepts 100% only if the replayed draft K/V is real
    # (unsynced tables write the history into the trash page and
    # acceptance collapses while tokens stay correct)
    st = sup.engine.spec_stats()
    assert st["proposed"] > 0 and st["accepted"] == st["proposed"]
