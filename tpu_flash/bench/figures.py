"""Figures from bench logs — the reference's logs→pgfplots pipeline
(figs/seqlen/main.tex:37 reads logs/compare1.txt verbatim), rebuilt as a
matplotlib script reading the JSONL emitted by `tpu_flash.bench.sweep`.

Usage: python -m tpu_flash.bench.figures [--logs logs/] [--out figs/]
Produces: figs/attention_seqlen.png (log-log TFLOP/s vs N per schedule,
the reference's seqlen figure), figs/softmax_bw.png (GB/s per shape).
Skips gracefully when matplotlib is unavailable or a log is missing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _load(path: str) -> list[dict]:
    if not os.path.exists(path):
        return []
    with open(path) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    # sweeps log gate failures as structured {"error": ...} rows (so a
    # gap is visible in the data) — those carry no measurement to plot
    return [r for r in rows if "error" not in r]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--logs", default="logs")
    ap.add_argument("--out", default="figs")
    args = ap.parse_args()

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib not available; skipping figures", file=sys.stderr)
        return

    os.makedirs(args.out, exist_ok=True)

    attn = _load(os.path.join(args.logs, "attention.jsonl"))
    if attn:
        fig, ax = plt.subplots(figsize=(7, 5))
        names = sorted({r["name"] for r in attn})
        for name in names:
            rows = sorted((r for r in attn if r["name"] == name),
                          key=lambda r: r["n"])
            ds = sorted({r["d"] for r in rows})
            d = ds[-1]
            pts = [(r["n"], r["tflops"]) for r in rows if r["d"] == d]
            if pts:
                ax.plot(*zip(*pts), marker="o", label=f"{name} (d={d})")
        ax.set_xscale("log", base=2)
        ax.set_yscale("log", base=10)
        ax.set_xlabel("sequence length N")
        ax.set_ylabel("TFLOP/s (covered work)")
        ax.set_title("Attention kernel throughput vs sequence length")
        ax.grid(True, which="both", alpha=0.3)
        ax.legend(fontsize=8)
        path = os.path.join(args.out, "attention_seqlen.png")
        fig.savefig(path, dpi=150, bbox_inches="tight")
        print(f"wrote {path}")

    sm = _load(os.path.join(args.logs, "softmax.jsonl"))
    if sm:
        fig, ax = plt.subplots(figsize=(8, 4))
        shapes = sorted({(r["m"], r["n"], r.get("axis", -1)) for r in sm})
        labels = [f"{m}×{n}\nax{ax_}" for m, n, ax_ in shapes]
        width = 0.35
        for off, name in ((-width / 2, "fused_softmax"), (width / 2, "xla_softmax")):
            ys = []
            for m, n, ax_ in shapes:
                row = next((r for r in sm if r["name"] == name
                            and (r["m"], r["n"], r.get("axis", -1))
                            == (m, n, ax_)), None)
                ys.append(row["gbps"] if row else 0)
            ax.bar([i + off for i in range(len(shapes))], ys, width, label=name)
        ax.set_xticks(range(len(shapes)))
        ax.set_xticklabels(labels, fontsize=8)
        ax.set_ylabel("GB/s")
        ax.set_title("Softmax bandwidth: fused Pallas vs XLA (row + col axes)")
        ax.legend()
        path = os.path.join(args.out, "softmax_bw.png")
        fig.savefig(path, dpi=150, bbox_inches="tight")
        print(f"wrote {path}")

    # Block-size scaling — the reference's thread-scaling figure analog
    # (figs/threads/main.tex:43-76): throughput vs the kernel's parallel-
    # resource knob, here the (block_q, block_kv) tile sizes, from the
    # round-2 sweep logs.
    exp = _load(os.path.join(args.logs, "r2_exp1.jsonl"))
    sweeps = {
        "dense d=128 @8k": "A.dense.bf16.8k.d128.",
        "dense d=64 @8k": "B.dense.bf16.8k.d64.",
        "sliding w=1025 @8k": "C.sliding.w1025.8k.",
    }
    if exp:
        fig, ax = plt.subplots(figsize=(8, 4.5))
        for label, prefix in sweeps.items():
            pts = {}
            for r in exp:
                tag = r.get("tag", "")
                if tag.startswith(prefix) and "tflops" in r:
                    blk = tag[len(prefix):].split(".v")[0]
                    pts[blk] = max(pts.get(blk, 0.0), r["tflops"])
            if not pts:
                continue
            items = sorted(pts.items(), key=lambda kv: kv[1])
            ax.plot([k.replace(".", "\n") for k, _ in items],
                    [v for _, v in items], marker="o", label=label)
        ax.set_ylabel("TFLOP/s (covered work)")
        ax.set_xlabel("(block_q, block_kv)")
        ax.set_title("Kernel throughput vs block sizes (v5e, measured)")
        ax.tick_params(axis="x", labelsize=7)
        ax.grid(True, alpha=0.3)
        ax.legend(fontsize=8)
        path = os.path.join(args.out, "blocks_scaling.png")
        fig.savefig(path, dpi=150, bbox_inches="tight")
        print(f"wrote {path}")

    # Devices scaling — sequence-sharded decode tokens/s vs shard count on
    # the virtual CPU mesh (scripts/r2_shards_scaling.py). The reference's
    # other scaling axis (threads); here the mesh seq axis. CPU wall-clock:
    # the curve SHAPE (overhead at fixed context, near-flat step time at
    # fixed per-shard context) is the claim, not the absolute numbers.
    sh = _load(os.path.join(args.logs, "shards_scaling.jsonl"))
    if sh:
        fig, (axl, axr) = plt.subplots(1, 2, figsize=(10, 4))
        # Left: decode tokens/s at FIXED TOTAL context — measures the pure
        # cost of sharding (shard_map dispatch + lse-merge collectives),
        # since per-shard work shrinks as 1/S.
        fixed = {
            "bf16 cache": lambda r: r["dtype"] == "bfloat16"
            and r["prompt_len"] == 128,
            "int8 cache": lambda r: r["dtype"] == "int8"
            and r["prompt_len"] == 128,
        }
        for label, pred in fixed.items():
            pts = sorted(((r["shards"], r["tok_s"]) for r in sh if pred(r)))
            if pts:
                axl.plot(*zip(*pts), marker="o", markersize=5, lw=2,
                         label=label)
        axl.set_xscale("log", base=2)
        axl.set_xlabel("sequence shards")
        axl.set_ylabel("decode tokens/s (batch 4)")
        axl.set_title("Fixed total context (overhead regime)", fontsize=10)
        axl.set_ylim(bottom=0)
        axl.grid(True, which="both", alpha=0.25)
        axl.legend(fontsize=8)
        # Right: FIXED PER-SHARD context. The virtual mesh runs all shards
        # serially on one host, so wall-clock sums the shards; divide by S
        # to emulate the per-device step time real hardware would pipeline.
        # Near-flat ⇒ the sharding sustains S× longer context at ~constant
        # per-device step cost (the long-context regime it exists for).
        pts = sorted(
            ((r["shards"], r["ms_step"] / r["shards"]) for r in sh
             if r["dtype"] == "bfloat16"
             and r["prompt_len"] == 128 * r["shards"] and r["shards"] > 1))
        if pts:
            axr.plot(*zip(*pts), marker="o", markersize=5, lw=2,
                     color="tab:green")
        axr.set_xscale("log", base=2)
        axr.set_xlabel("sequence shards (context = 128 × shards)")
        axr.set_ylabel("emulated per-device ms/step")
        axr.set_title("Fixed per-shard context (long-context regime)",
                      fontsize=10)
        axr.set_ylim(bottom=0)
        axr.grid(True, which="both", alpha=0.25)
        fig.suptitle("Seq-sharded decode scaling — virtual CPU mesh "
                     "(curve shape, not absolute perf)", fontsize=11)
        fig.tight_layout()
        path = os.path.join(args.out, "devices_scaling.png")
        fig.savefig(path, dpi=150, bbox_inches="tight")
        print(f"wrote {path}")

    # Serving features — end-to-end engine tokens/s from the r2_exp6
    # sweep (prefix caching warm-vs-cold, speculative k, sampling paths).
    # Wall-clock bars: these features exist to move engine throughput,
    # not kernel FLOP/s.
    sv = _load(os.path.join(args.logs, "r2_exp6.jsonl"))
    if sv:
        rows = {}
        for r in sv:  # keep the LAST measurement of each tag
            if "tok_s" in r:
                rows[r["tag"]] = r
        groups = [
            ("prefix caching\n(2k shared prompt)",
             [("cold", "A.cold"), ("warm", "A.prefix_cache")]),
            ("speculative decoding\n(2-layer draft)",
             [("plain", "B.plain"), ("k=2", "B.spec_k2"),
              ("k=4", "B.spec_k4")]),
            ("sampling path",
             [("greedy", "C.greedy"), ("temp", "C.temp"),
              ("top-k/p", "C.topk_topp")]),
        ]
        present = [(title, [(lbl, rows[tag]) for lbl, tag in bars
                            if tag in rows])
                   for title, bars in groups]
        present = [(t, b) for t, b in present if b]
        if present:
            fig, axes = plt.subplots(1, len(present),
                                     figsize=(4 * len(present), 3.6))
            if len(present) == 1:
                axes = [axes]
            for ax, (title, bars) in zip(axes, present):
                labels = [lbl for lbl, _ in bars]
                vals = [r["tok_s"] for _, r in bars]
                ax.bar(labels, vals, color="tab:blue", width=0.6)
                for i, (lbl, r) in enumerate(bars):
                    note = ""
                    if "accept" in r:
                        note = f"acc {r['accept']:.0%}"
                    elif "hit_tokens" in r:
                        note = f"{r['hit_tokens']//1000}k hit"
                    if note:
                        ax.annotate(note, (i, vals[i]), ha="center",
                                    va="bottom", fontsize=7)
                ax.set_title(title, fontsize=9)
                ax.set_ylabel("engine tokens/s")
                ax.grid(True, axis="y", alpha=0.25)
            fig.suptitle("Serving features — end-to-end engine wall-clock "
                         "(v5e)", fontsize=11)
            fig.tight_layout()
            path = os.path.join(args.out, "serving_features.png")
            fig.savefig(path, dpi=150, bbox_inches="tight")
            print(f"wrote {path}")


if __name__ == "__main__":
    main()
