"""Health-checked serving loop: failure detection + restart-from-checkpoint.

The reference ships no serving runtime (its aux inventory stops at bench
logs — SURVEY.md §5 lists failure detection/elastic recovery as ours to
build). This module closes that gap for the engine: a supervisor that
wraps :meth:`Engine.step` with

- **failure detection** — a step that raises (XLA error, tunnel abort,
  host preemption) or produces out-of-range token ids marks the engine
  unhealthy;
- **periodic checkpoints** — atomic snapshots via
  :func:`serving.checkpoint.save_checkpoint` (write to a fresh step dir,
  then atomically repoint ``LATEST``), taken at the engine's quiesce
  point between steps;
- **restart-from-checkpoint recovery** — on failure the engine is
  rebuilt from the latest snapshot (or fresh, if none), and every
  journaled request that the snapshot does not already know about is
  re-submitted, so no accepted request is ever lost;
- **a submission journal** — :meth:`Supervisor.submit` durably records
  the request before the engine sees it (JSONL, fsync'd), which is what
  makes the recovery replay exact.

A synchronous host loop cannot interrupt a wedged device call from
inside the process, so hang detection is cooperative: the supervisor
records a per-step deadline in ``<dir>/HEARTBEAT`` (step index + wall
deadline); an external process manager that finds the deadline expired
kills the process, and re-running the same supervisor (same directory)
resumes from the last checkpoint + journal. ``Supervisor.resume`` is
that re-entry point.

Checkpoint/resume exactness (bit-identical cache bytes, restored RNG and
sample key — tests/test_checkpoint.py) is what makes recovery
deterministic: a supervised run with an injected mid-run crash produces
exactly the tokens of an uninterrupted run (tests/test_supervisor.py).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, List, Optional

import numpy as np

from tpu_flash.serving.engine import Engine, FinishedRequest, Request
from tpu_flash.serving.checkpoint import load_checkpoint, save_checkpoint

_LATEST = "LATEST"
_JOURNAL = "journal.jsonl"
_HEARTBEAT = "HEARTBEAT"


@dataclasses.dataclass
class SupervisorConfig:
    dir: str                          # checkpoints + journal + heartbeat
    checkpoint_every: int = 32        # steps between snapshots
    max_restarts: int = 3             # per run() call
    keep_checkpoints: int = 2         # trailing snapshot dirs retained
    step_timeout_s: float = 120.0     # advertised deadline in HEARTBEAT
    # test/chaos hook: called as fault_hook(step_index, engine) before
    # each step; raising simulates a device/host failure at that step
    fault_hook: Optional[Callable[[int, Engine], None]] = None


class Supervisor:
    """Run an :class:`Engine` under health checks and crash recovery.

    ``make_engine`` builds a fresh engine (used when no checkpoint exists
    yet — including after a crash that predates the first snapshot);
    recovery otherwise goes through :func:`load_checkpoint`. For
    tensor-parallel engines pass the same ``mesh``/``tp_axis`` the
    factory uses so restores re-install the sharding.
    """

    def __init__(
        self,
        make_engine: Callable[[], Engine],
        cfg: SupervisorConfig,
        *,
        mesh=None,
        tp_axis: str = "model",
        draft=None,  # (draft_params, draft cfg): re-attached on recovery
        # when the snapshot's EngineConfig uses speculation (draft weights,
        # like the mesh, are the operator's to supply at restore time)
    ):
        self.cfg = cfg
        self._make_engine = make_engine
        self._mesh = mesh
        self._tp_axis = tp_axis
        self._draft = draft
        os.makedirs(cfg.dir, exist_ok=True)
        self.restarts = 0
        self.step_index = 0
        self.engine = self._restore_or_fresh()

    # ---- durable submission journal -----------------------------------

    def _journal_path(self) -> str:
        return os.path.join(self.cfg.dir, _JOURNAL)

    def submit(self, req: Request) -> None:
        """Durably journal the request, then hand it to the engine."""
        with open(self._journal_path(), "a") as f:
            f.write(json.dumps(dataclasses.asdict(req)) + "\n")
            f.flush()
            os.fsync(f.fileno())
        self.engine.submit(req)

    def _journaled_requests(self) -> List[Request]:
        path = self._journal_path()
        if not os.path.exists(path):
            return []
        out = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(Request(**json.loads(line)))
        return out

    # ---- checkpoint rotation ------------------------------------------

    def _latest_path(self) -> Optional[str]:
        marker = os.path.join(self.cfg.dir, _LATEST)
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            name = f.read().strip()
        path = os.path.join(self.cfg.dir, name)
        return path if os.path.exists(path) else None

    def _checkpoint(self) -> None:
        # the engine cannot quiesce mid-chunked-prefill; defer to the
        # next step boundary where prefilling is empty
        if self.engine.prefilling:
            return
        name = f"step_{self.step_index:08d}"
        save_checkpoint(os.path.join(self.cfg.dir, name), self.engine)
        tmp = os.path.join(self.cfg.dir, _LATEST + ".tmp")
        with open(tmp, "w") as f:
            f.write(name)
        os.replace(tmp, os.path.join(self.cfg.dir, _LATEST))  # atomic
        self._prune(keep=name)

    def _prune(self, keep: str) -> None:
        snaps = sorted(
            d for d in os.listdir(self.cfg.dir)
            if d.startswith("step_") and d != keep
        )
        for d in snaps[: max(0, len(snaps) - (self.cfg.keep_checkpoints - 1))]:
            import shutil

            shutil.rmtree(os.path.join(self.cfg.dir, d), ignore_errors=True)

    # ---- health + recovery --------------------------------------------

    def _heartbeat(self) -> None:
        tmp = os.path.join(self.cfg.dir, _HEARTBEAT + ".tmp")
        with open(tmp, "w") as f:
            json.dump(
                {
                    "step": self.step_index,
                    "deadline": time.time() + self.cfg.step_timeout_s,
                },
                f,
            )
        os.replace(tmp, os.path.join(self.cfg.dir, _HEARTBEAT))

    def _check_health(self) -> None:
        vocab = self.engine.mcfg.vocab_size
        for r in self.engine.running.values():
            tok = r.tokens[-1]
            if not (0 <= tok < vocab):
                raise RuntimeError(
                    f"decode produced out-of-vocab token {tok} "
                    f"(rid={r.rid}) — device state corrupt"
                )

    def _restore_or_fresh(self) -> Engine:
        latest = self._latest_path()
        if latest is not None:
            engine = load_checkpoint(
                latest, mesh=self._mesh, tp_axis=self._tp_axis,
                draft=self._draft,
            )
            # the snapshot name carries its step index — rewind so the
            # step counter (and snapshot naming) tracks the restored state
            self.step_index = int(os.path.basename(latest).split("_")[1])
        else:
            engine = self._make_engine()
            self.step_index = 0
        # replay journaled requests the snapshot predates (dedupe by rid
        # against every queue the restored engine knows about)
        known = (
            {r.rid for r in engine.waiting}
            | {r.rid for r in engine.running.values()}
            | {f.rid for f in engine.finished}
        )
        for req in self._journaled_requests():
            if req.rid not in known:
                engine.submit(req)
        return engine

    def _recover(self, err: BaseException) -> None:
        self.restarts += 1
        if self.restarts > self.cfg.max_restarts:
            raise RuntimeError(
                f"supervisor exceeded max_restarts={self.cfg.max_restarts}"
            ) from err
        self.engine = self._restore_or_fresh()

    # ---- main loop -----------------------------------------------------

    def resume(self, max_steps: int = 10_000) -> List[FinishedRequest]:
        """Alias of :meth:`run` — the re-entry point after an external
        kill (same directory ⇒ same checkpoint + journal)."""
        return self.run(max_steps)

    def run(self, max_steps: int = 10_000) -> List[FinishedRequest]:
        steps = 0
        eng = self.engine
        while (
            eng.waiting or eng.running or eng.prefilling
        ) and steps < max_steps:
            self._heartbeat()
            try:
                if self.cfg.fault_hook is not None:
                    self.cfg.fault_hook(self.step_index, eng)
                eng.step()
                self._check_health()
            except Exception as e:  # noqa: BLE001 — any failure → recover
                self._recover(e)
                eng = self.engine
                continue
            self.step_index += 1
            steps += 1
            if (
                self.cfg.checkpoint_every
                and self.step_index % self.cfg.checkpoint_every == 0
            ):
                self._checkpoint()
        return self.engine.finished
