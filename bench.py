"""Benchmark: end-to-end reconstructed frames/sec of the flagship pipeline.

Runs the full cista-eiflow step (DCEIFlow 6 GRU iterations -> frame/state
warp -> CISTA-LSTC, 180x240, 5-bin voxels — the reference's headline
configuration) as a closed recurrent loop on the real TPU chip and reports
frames/sec against the driver's north-star target (2000 fps/chip,
/root/repo/BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

BASELINE_FPS = 2000.0


def measure(model, batch, steps, dtype, iters, depth, chunk):
    """One measured point: closed-loop fps + the fully resolved config."""
    from cista_flow_tpu.configs import Config
    from cista_flow_tpu.models import composite
    cfg = Config(model_mode=model, image_dim=(180, 240), dtype=dtype,
                 flow_iters=iters, depth=depth)
    h, w = cfg.image_dim

    params, mstate = composite.init(jax.random.PRNGKey(0), cfg)
    cdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    if dtype == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params)

    hp = (h + 31) // 32 * 32
    wp = (w + 31) // 32 * 32

    @jax.jit
    def run_chunk(params, mstate, events_seq, rec0, state, flow_chain):
        """Closed-loop recurrence over `chunk` steps, on-device (the
        streaming voxels for the chunk are staged in HBM — a production
        server overlaps the host feed with compute). cista-idnet carries its
        next_flow chaining exactly like the serving runner; cista-eraft uses
        the time-parallel serving path (one batched flow-net call per chunk,
        exactly what Reconstructor.step_window dispatches)."""
        if model == "cista-eraft" and os.environ.get("BENCH_ERAFT_SEQ", "1") == "1":
            # time-parallel serving path (batched flow net over the chunk);
            # default since it measured 440 vs 419 fps — BENCH_ERAFT_SEQ=0
            # falls back to per-step flow if the chunk*batch flow-net
            # compile is too heavy for the tunnel's remote-compile helper
            voxel_seq = jnp.concatenate(
                [jnp.zeros_like(events_seq[:1]), events_seq], axis=0)
            recs, _, state = composite.apply_sequence_eraft(
                params, mstate, voxel_seq, state, cfg, rec0=rec0)
            return recs[-1], state, flow_chain, recs

        def body(carry, xs):
            rec, state, chain = carry
            batch_data = {"event_voxel": xs[0], "rec_img0": rec,
                          "event_voxel_s2d": xs[1]}
            kwargs = {}
            if model == "cista-eraft":
                batch_data["event_voxel_old"] = xs[2]
            elif model == "cista-idnet":
                kwargs["flow_init"] = chain
            rec, batch_flow, state, _ = composite.apply(
                params, mstate, batch_data, state, cfg,
                collect_preds=False, **kwargs)
            if model == "cista-idnet":
                chain = batch_flow["next_flow"]
            return (rec, state, chain), rec

        # whole-window s2d pack of the voxels for the CISTA head: ONE
        # amortized transpose instead of one per scan step (DCE'd by XLA
        # whenever the head's s2d gate is off)
        from cista_flow_tpu.ops import s2d as S2D
        ev_s2d = jax.vmap(S2D.space_to_depth)(events_seq)
        xs = (events_seq, ev_s2d)
        if model == "cista-eraft":
            # previous-window voxels: the shifted stream (first = zeros)
            old = jnp.concatenate([jnp.zeros_like(events_seq[:1]),
                                   events_seq[:-1]], axis=0)
            xs = (events_seq, ev_s2d, old)
        (rec, state, flow_chain), recs = jax.lax.scan(
            body, (rec0, state, flow_chain), xs,
            unroll=int(os.environ.get("BENCH_UNROLL", "1")))
        return rec, state, flow_chain, recs

    # Optional XLA/TPU compiler options, "k=v,k=v" (ship with the computation
    # through the axon remote-compile tunnel; client-side XLA_FLAGS cannot
    # reach the TPU backend here).
    opts = os.environ.get("CISTA_XLA_OPTS", "")
    if opts:
        codict = dict(kv.split("=", 1) for kv in opts.split(",") if kv)
        inner = run_chunk.__wrapped__

        def run_chunk(params, mstate, events_seq, rec0, state, flow_chain,
                      _cache={}):
            if "c" not in _cache:
                _cache["c"] = jax.jit(inner).lower(
                    params, mstate, events_seq, rec0, state,
                    flow_chain).compile(compiler_options=codict)
            return _cache["c"](params, mstate, events_seq, rec0, state,
                               flow_chain)

    rng = np.random.default_rng(0)
    events_seq = jnp.asarray(
        rng.standard_normal((chunk, batch, h, w, cfg.num_bins)), cdt)
    rec = jnp.zeros((batch, h, w, 1), cdt)
    state = jax.tree_util.tree_map(
        lambda x: x.astype(cdt), composite.zero_state(batch, cfg))
    flow_chain = jnp.zeros((batch, hp, wp, 2), cdt)

    def force(x):
        """Honest device sync: a scalar readback. (block_until_ready can
        return early through the experimental axon tunnel.)"""
        return float(jnp.sum(x.astype(jnp.float32)))

    # warmup / compile (incl. the sync reduction)
    rec_w, _, _, _ = run_chunk(params, mstate, events_seq, rec, state,
                               flow_chain)
    force(rec_w)

    # Repeat the timed loop: host-side contention (another training run, a
    # noisy driver VM) can skew any single sample by 10-25% (PERF.md round-5:
    # the BENCH_r04 701.8-vs-755.5 episode). The median over reps is the
    # reported number; the spread tells the reader whether to trust it.
    reps = int(os.environ.get("BENCH_REPS", "3"))
    fps_samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            rec, state, flow_chain, recs = run_chunk(
                params, mstate, events_seq, rec, state, flow_chain)
        force(rec)
        dt = time.perf_counter() - t0
        fps_samples.append(steps * chunk * batch / dt)

    fps_samples.sort()
    fps = fps_samples[len(fps_samples) // 2]
    # the exact measured configuration, so the number is reproducible from
    # the record alone (no ambient env needed)
    resolved = {
        "model": model, "batch": batch, "chunk": chunk, "steps": steps,
        "dtype": dtype, "flow_iters": cfg.default_flow_iters(),
        "depth": cfg.depth,
        "encoder_merge": cfg.encoder_merge,
        "serve_pallas": cfg.serve_pallas,
        "corr_fuse_proj": cfg.corr_fuse_proj,
        "eraft_pair_tower": cfg.eraft_pair_tower,
        "eraft_tchunk": cfg.eraft_tchunk,
        "flow_half": cfg.flow_half,
    }
    spread = ((fps_samples[-1] - fps_samples[0]) / fps
              if fps > 0 else 0.0)
    resolved["reps"] = [round(s, 1) for s in fps_samples]
    resolved["spread"] = round(spread, 4)
    if spread > 0.05:
        print(f"bench.py: WARNING rep spread {spread * 100:.1f}% > 5% — "
              f"likely host contention; samples {resolved['reps']}",
              file=sys.stderr)
    return fps, resolved


def main():
    from cista_flow_tpu import compile_cache

    compile_cache.enable()

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    model = os.environ.get("BENCH_MODEL", "cista-eiflow")
    chunk = int(os.environ.get("BENCH_CHUNK", "160"))
    # Serving GRU iterations (reference default: eiflow 6 / eraft 12 —
    # ref DCEIFlow/DCEIFlow.py:143, ERAFT/eraft.py:114; the reference itself
    # treats this as a free parameter). Benchmark default for cista-eiflow is
    # the QUALITY-GATED reduced point from the measured speed/quality
    # frontier (PERF.md round-5 admissions: on the fine-tuned serving
    # checkpoints, ONE GRU iteration from the strong flow warm start still
    # beats the reference-default quality on every gated metric, for both
    # eiflow and eraft; gate/ carries the standing anchors + targets and
    # frontier.py reproduces the admission). Override with BENCH_ITERS,
    # or BENCH_ITERS=6 / 12 for the reference-default configurations.
    iters = os.environ.get("BENCH_ITERS", "")
    iters = (int(iters) if iters
             else {"cista-eiflow": 1, "cista-eraft": 1}.get(model))
    # Serving ISTA depth (reference default 5, ref: e2v/e2v_model.py:34-35).
    # The ISTA blocks are weight-tied (ONE D/P/Lambda reused each iteration).
    # Pure serving-time truncation measured INADMISSIBLE (PERF.md round 5:
    # depth 3 on the depth-5 checkpoint costs −2.9 dB), so each reduced
    # depth default is backed by a FINE-TUNED serving checkpoint with a
    # committed gate anchor (rec-only epochs + optionally a supervised
    # flow touch-up, decided per variant by the held-out eval):
    #   eiflow depth 1 — gate/flagship_ft1_f16.npz, (1,1) quality
    #     24.38/0.813/EPE 0.274 vs ref-default 23.80/0.795/0.313;
    #   idnet depth 2 — gate/idnet_ft2_f16.npz, 24.28/0.809/2.40;
    #   eraft depth 1 — gate/eraft_ft1_f16.npz, (1,1) 24.09/0.815/0.364
    #     (24 rec-only epochs; eraft's flow touch-up measured NEGATIVE
    #     and was dropped).
    # BENCH_DEPTH=5 reproduces the depth-5 checkpoints' configuration.
    depth = os.environ.get("BENCH_DEPTH", "")
    depth = (int(depth) if depth
             else {"cista-eiflow": 1, "cista-idnet": 2,
                   "cista-eraft": 1}.get(model, 5))

    fps, resolved = measure(model, batch, steps, dtype, iters, depth, chunk)
    out = {
        "metric": "e2e_recon_frames_per_sec_180x240_"
                  + model.replace("-", "_"),
        "value": round(fps, 1),  # median over config.reps samples
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "reps": resolved["reps"],
        "spread": resolved["spread"],
        "config": resolved,
    }

    # Also report the REFERENCE-DEFAULT configuration (eiflow iters=6 /
    # eraft iters=12, depth=5) alongside the gated headline whenever the
    # headline is a reduced point — both lines in one JSON record,
    # per-round honesty.
    ref_iters = {"cista-eiflow": 6, "cista-eraft": 12,
                 "cista-idnet": 1}.get(model)
    ref_depth = 5
    if (os.environ.get("BENCH_REF_LINE", "1") == "1"
            and ref_iters is not None
            and (resolved["flow_iters"], resolved["depth"])
            != (ref_iters, ref_depth)):
        ref_fps, ref_resolved = measure(model, batch, steps, dtype,
                                        ref_iters, ref_depth, chunk)
        out["ref_default"] = {
            "value": round(ref_fps, 1),
            "vs_baseline": round(ref_fps / BASELINE_FPS, 3),
            "flow_iters": ref_resolved["flow_iters"],
            "depth": ref_resolved["depth"],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
