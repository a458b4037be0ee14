"""A/B microbenchmark for the Pallas AR sampler kernel variants.

Times ``sampler_frames_pallas`` configurations on the attached TPU with the
same hard-sync + chained-call methodology as bench.py (the tunneled backend
makes single-call timings RPC-bound; the chained marginal cost estimates
on-device time).  Used to tune the per-sample serial op chain — at B=1 the
kernel is latency-bound, so op-count changes move the needle directly.

Usage: python tools/sampler_microbench.py [--frames 100] [--chain 24]
       [--variants dense-bf16,sparse-bf16,...]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    return np.asarray(x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--chain", type=int, default=24)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--variants", type=str, default="")
    ap.add_argument("--ablate", nargs="?", const="sparse-bf16", default=None,
                    help="profile a base variant (default sparse-bf16; any "
                         "VARIANTS name works, e.g. bunch4-sparse) by "
                         "ablating one kernel stage at a time (each replaced "
                         "by a cheap dependency-preserving op); deltas rank "
                         "stage cost")
    ap.add_argument("--weights", type=str, default="weights/vocoder_synthetic.npz",
                    help=".npz checkpoint whose gru_a_mask supplies the "
                         "realistic sparse pattern")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dss_tpu.vocoder import LPCNetModel
    from dss_tpu.vocoder.net import FRAME_SIZE
    from dss_tpu.ops.pallas.sampler import (sampler_frames_pallas,
                                            tile_sparse_pattern)

    print(f"backend: {jax.devices()[0].platform} ({jax.devices()[0]})")

    model = LPCNetModel()
    params = model.init(jax.random.PRNGKey(0))
    try:
        ck = dict(np.load(args.weights))
        mask = ck["gru_a_mask"]
        print(f"sparse mask from {args.weights}")
    except (FileNotFoundError, KeyError):
        rng = np.random.default_rng(7)
        H, G = np.asarray(params["gru_a_mask"]).shape
        keep = rng.random((H // 16, G // 128)) < 0.2
        keep[0, :] = True
        mask = np.repeat(np.repeat(keep.astype(np.float32), 16, 0), 128, 1)
        print("sparse mask: random 20% tiles")
    pattern, kept = tile_sparse_pattern(mask)
    print(f"pattern kept={kept:.3f} rows/group={[len(r) for r in pattern]}")
    params_sp = dict(params, gru_a_mask=jnp.asarray(mask, jnp.float32))

    T, B = args.frames, args.batch
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.normal(size=(B, T, 128)) * 0.1, jnp.float32)
    lpc = jnp.asarray(rng.normal(size=(B, T, 16)) * 0.01, jnp.float32)
    temp = jnp.full((B, T, 1), 1.5, jnp.float32)
    seeds = jnp.arange(T, dtype=jnp.int32)

    def carry0():
        return (jnp.zeros((B, model.gru_a_units), jnp.float32),
                jnp.zeros((B, model.gru_b_units), jnp.float32),
                jnp.zeros((B, 16), jnp.float32),
                jnp.full((B,), 128, jnp.int32))

    audio_s = B * T * FRAME_SIZE / 16000.0

    VARIANTS = {
        "dense-f32": dict(weight_dtype=jnp.float32, sparse=False),
        "dense-bf16": dict(weight_dtype=jnp.bfloat16, sparse=False),
        "sparse-bf16": dict(weight_dtype=jnp.bfloat16, sparse=True),
        "sparse-f32": dict(weight_dtype=jnp.float32, sparse=True),
        "dense-bf16-nofuse": dict(weight_dtype=jnp.bfloat16, sparse=False,
                                  fuse_embed=False),
        "sparse-bf16-nohoist": dict(weight_dtype=jnp.bfloat16, sparse=True,
                                    hoist_noise=False),
        "dense-bf16-nohoist": dict(weight_dtype=jnp.bfloat16, sparse=False,
                                   hoist_noise=False),
        # Mosaic fori_loop only supports unroll=1 or full unroll.
        "sparse-bf16-unrollfull": dict(weight_dtype=jnp.bfloat16, sparse=True,
                                       unroll=160),
        # Wider sparse column groups: fewer serial ops, more streaming.
        "sparse-bf16-gate": dict(weight_dtype=jnp.bfloat16, sparse=True,
                                 sparse_group_lanes=384),
        "sparse-bf16-union": dict(weight_dtype=jnp.bfloat16, sparse=True,
                                  sparse_group_lanes=1152),
        # Serial-chain restructures: packed single-reduction argmax and
        # next-step recurrent projections issued off the chain.
        "sparse-bf16-nopack": dict(weight_dtype=jnp.bfloat16, sparse=True,
                                   packed_argmax=False),
        "sparse-bf16-pack": dict(weight_dtype=jnp.bfloat16, sparse=True,
                                 packed_argmax=True),
        "sparse-bf16-prerec": dict(weight_dtype=jnp.bfloat16, sparse=True,
                                   packed_argmax=False, pre_rec=True),
        # GRU-B-only projection carry (1 vreg vs full mode's 9):
        # STILL NEGATIVE (0.88 -> 1.01 us/sample) — any loop-carried
        # restructure disrupts Mosaic's own overlap of gh_b with the
        # front chain.
        "sparse-bf16-prerecb": dict(weight_dtype=jnp.bfloat16, sparse=True,
                                    pre_rec="b"),
        "sparse-bf16-pack-prerec": dict(weight_dtype=jnp.bfloat16,
                                        sparse=True, packed_argmax=True,
                                        pre_rec=True),
        "dense-bf16-pack-prerec": dict(weight_dtype=jnp.bfloat16,
                                       sparse=False, packed_argmax=True,
                                       pre_rec=True),
        # Bunched models (S samples per GRU step; B=1 latency path).
        "bunch2-dense": dict(bunch=2, sparse=False),
        "bunch2-sparse": dict(bunch=2, sparse=True),
        "bunch4-dense": dict(bunch=4, sparse=False),
        "bunch4-sparse": dict(bunch=4, sparse=True),
        "bunch4-sparse-nopack": dict(bunch=4, sparse=True,
                                     packed_argmax=False),
        # Correction-chain restructures.  VPU masked-sublane-sum row gather
        # (vs MXU one-hot dot) measured +23% (S=4) / +12% (S=2) device RTF
        # and is now the DEFAULT (plain bunchN-sparse above exercises it);
        # -novpuc keeps the old MXU form for A/B.  Scalar-FMA intra-bunch
        # LPC predictions measured NEGATIVE (0.66 -> 0.76 us/sample).
        "bunch2-sparse-novpuc": dict(bunch=2, sparse=True, vpu_corr=False),
        "bunch4-sparse-novpuc": dict(bunch=4, sparse=True, vpu_corr=False),
        "bunch4-sparse-fmap": dict(bunch=4, sparse=True, fma_pred=True),
        # 8x row-replicated correction tables (mask-free aligned loads)
        # measured +2.5-3% and are the DEFAULT; -nocrep for A/B.
        "bunch4-sparse-nocrep": dict(bunch=4, sparse=True, corr_rep=False),
        "bunch2-sparse-nocrep": dict(bunch=2, sparse=True, corr_rep=False),
        # VPU masked-sum for the MAIN embedding gather measured +16% (b1)
        # / +15% (b2) / +5% (b4) and is now the DEFAULT; -novpue keeps
        # the MXU one-hot dot for A/B.
        "sparse-bf16-novpue": dict(weight_dtype=jnp.bfloat16, sparse=True,
                                   vpu_emb=False),
        "bunch4-sparse-novpue": dict(bunch=4, sparse=True, vpu_emb=False),
        "bunch2-sparse-novpue": dict(bunch=2, sparse=True, vpu_emb=False),
        "bunch8-sparse": dict(bunch=8, sparse=True),
        "bunch16-sparse": dict(bunch=16, sparse=True),
    }
    if args.ablate:
        base = dict(VARIANTS[args.ablate])
        stages = ["", "pred", "encode", "gather", "grua", "grub",
                  "head", "noise", "argmax", "decode", "shift", "store"]
        if base.get("bunch", 1) > 1:
            stages.insert(stages.index("noise"), "corr")
        for stage in stages:
            name = f"{args.ablate}~{stage or 'full'}"
            VARIANTS[name] = dict(base, ablate=stage)
        names = [n for n in VARIANTS if "~" in n]
    else:
        names = [v for v in args.variants.split(",") if v] or \
            ["dense-bf16", "sparse-bf16"]

    from dss_tpu.ops.pallas.sampler import sampler_frames_bunched_pallas

    bunch_cache = {}

    def bunch_setup(S, sparse):
        if (S, sparse) not in bunch_cache:
            m = LPCNetModel(bunch=S)
            p = m.init(jax.random.PRNGKey(0))
            pat = None
            if sparse:
                p = dict(p, gru_a_mask=jnp.asarray(mask, jnp.float32))
                pat = pattern
            c = (jnp.zeros((B, m.gru_a_units), jnp.float32),
                 jnp.zeros((B, m.gru_b_units), jnp.float32),
                 jnp.zeros((B, 16), jnp.float32),
                 jnp.full((B, S), 128, jnp.int32))
            bunch_cache[(S, sparse)] = (m, p, pat, c)
        return bunch_cache[(S, sparse)]

    results = {}
    for name in names:
        cfg = dict(VARIANTS[name])
        sparse = cfg.pop("sparse")
        S = cfg.pop("bunch", 1)
        if S > 1:
            bm, p, pat, bc = bunch_setup(S, sparse)
            run = lambda c, **kw: sampler_frames_bunched_pallas(
                bm, p, c, cond, lpc, temp, seeds, **kw)
            carry_fn = lambda: bc
        else:
            p = params_sp if sparse else params
            pat = pattern if sparse else None
            run = lambda c, **kw: sampler_frames_pallas(
                model, p, c, cond, lpc, temp, seeds, **kw)
            carry_fn = carry0
        kw = dict(frame_size=FRAME_SIZE, stochastic=True,
                  sparse_pattern=pat, **cfg)

        t0 = time.perf_counter()
        c, sig = run(carry_fn(), **kw)
        _sync(sig)
        print(f"{name}: compile+run {time.perf_counter() - t0:.1f}s")

        t_single = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            c, sig = run(c, **kw)
            _sync(sig)
            t_single = min(t_single, time.perf_counter() - t0)

        t_chain = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(args.chain):
                c, sig = run(c, **kw)
            _sync(sig)
            t_chain = min(t_chain, time.perf_counter() - t0)

        rtf_call = audio_s / t_single
        rtf_dev = audio_s * (args.chain - 1) / max(t_chain - t_single, 1e-9)
        us_per_sample = 1e6 * (t_chain - t_single) / (args.chain - 1) \
            / (T * FRAME_SIZE)
        results[name] = (rtf_call, rtf_dev, us_per_sample)
        print(f"{name}: rtf_call={rtf_call:.1f}x rtf_device={rtf_dev:.1f}x "
              f"({us_per_sample:.3f} us/sample)")

    print("\n== summary ==")
    for name, (rc, rd, us) in results.items():
        print(f"{name:24s} {rd:7.1f}x device  {us:7.3f} us/sample")


if __name__ == "__main__":
    main()
