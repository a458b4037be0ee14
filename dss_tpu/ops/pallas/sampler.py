"""Pallas TPU kernel: the vocoder's autoregressive sample-rate loop.

Replaces the reference's C sample loop (xiph LPCNet's lpcnet_synthesize:
per-16kHz-sample sparse-GRU inference) with an on-chip kernel that keeps GRU
state, the signal history, and ALL network weights resident in VMEM across
the whole synthesis call:

* grid = one step per 10 ms frame; frame-rate inputs (conditioning, LPC,
  temperature, seed) stream in per-step while weights stay pinned;
* the 160-sample inner loop is a ``fori_loop`` whose state lives in VMEM
  scratch (h_a, h_b, signal history, last excitation) — nothing round-trips
  to HBM between samples;
* mu-law embedding lookups run as one-hot matmuls on the MXU (a [B, 256]
  one-hot against the [256, 128] table beats a gather at these shapes);
* sampling uses the on-core PRNG (Gumbel-max over the 256 logits) with
  pitch-correlation-dependent sharpening, or greedy argmax when
  ``temperature < 0`` is passed (used by equivalence tests).

Weights footprint (bunch=1): fused embedding tables (3 x 256 x 1152 bf16)
+ GRU-A recurrent slab + GRU-B / output heads ~= 3 MB — comfortably
VMEM-resident; the bunched kernel (see ``sampler_frames_bunched_pallas``)
grows the table set to 2S+1 and stays inside VMEM through bunch=8.

Profiling: ``tools/sampler_microbench.py`` (A/B variants and per-stage
``--ablate``).  At B=1 the kernel is LATENCY-bound on its loop-carried op
chain — ops off that chain (prng, output stores) are free, cross-lane
reductions and MXU dispatches on it cost ~0.1-0.2 us each.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# CPU-backed tests exercise the kernels through the Pallas interpreter.
_INTERPRET = os.environ.get("DSS_PALLAS_INTERPRET", "0") == "1"


MULAW_LEVELS = 256
_MU = 255.0
_LOG1P_MU = float(np.log1p(_MU))


def _mulaw_encode(x):
    x = jnp.clip(x, -1.0, 1.0)
    y = jnp.sign(x) * jnp.log1p(_MU * jnp.abs(x)) / _LOG1P_MU
    return jnp.clip(jnp.round((y + 1.0) * 0.5 * (MULAW_LEVELS - 1)),
                    0, MULAW_LEVELS - 1).astype(jnp.int32)


def _mulaw_decode(idx):
    y = idx.astype(jnp.float32) / (MULAW_LEVELS - 1) * 2.0 - 1.0
    return jnp.sign(y) * (jnp.exp(jnp.abs(y) * _LOG1P_MU) - 1.0) / _MU


def _one_hot(idx_col, levels, dtype=jnp.float32):
    """idx_col [B, 1] int32 -> [B, levels] one-hot."""
    B = idx_col.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (B, levels), 1)
    return (lanes == idx_col).astype(dtype)


def _gather_rows_sum(refs_and_idx, vpu: bool = False, rep: bool = False):
    """Sum of dynamic row gathers from VMEM tables, one MXU dispatch.

    Each entry is (ref [R, N], idx): Mosaic requires dynamic sublane
    offsets to be provably 8-aligned, so the aligned 8-row block containing
    each ``idx`` is loaded; the blocks are stacked [8k, N] and hit ONE
    one-hot [1, 8k] dot that selects AND sums all k rows (the kernel is
    latency-bound on its serial op chain — one dispatch beats k).
    Traffic is 8 rows per table, still ~60x less than the full one-hot
    matmuls this replaces.

    ``vpu=True`` swaps the one-hot dot for a masked sublane sum: the row
    select becomes a handful of VPU ops, cheaper on the serial chain than
    an MXU dispatch.  Bit-identical (the mask zeroes all but one row per
    table; f32 accumulation either way; pinned in tests/test_bunched.py
    and tests/test_pallas.py).  Measured on v5e (tile-sparse B=1,
    us/sample): bunched corrections (k=2, 2 vregs) 0.66 -> 0.54 at S=4;
    main embedding gather too — even at 3-9 tables x 9 vregs the masked
    sums beat the dispatch: b1 1.03 -> 0.89, b2 0.71 -> 0.62,
    b4 0.54 -> 0.52.  Default everywhere on the fused-gather path; the
    one-hot dot form is kept for A/B (microbench -novpue/-novpuc).
    """
    if rep:
        # Tables stored 8x row-replicated ([8i+k] == row i): every row is
        # 8-aligned, so the dynamic load needs no mask or sublane reduce.
        total = None
        for ref, idx in refs_and_idx:
            row = ref[pl.ds(idx * 8, 1), :].astype(jnp.float32)  # [1, N]
            total = row if total is None else total + row
        return total
    if vpu:
        total = None
        for ref, idx in refs_and_idx:
            base = (idx // 8) * 8
            block = ref[pl.ds(base, 8), :].astype(jnp.float32)  # [8, N]
            mask = (jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
                    == (idx - base)).astype(jnp.float32)
            picked = block * mask
            total = picked if total is None else total + picked
        return jnp.sum(total, axis=0, keepdims=True)
    blocks, sels = [], []
    for ref, idx in refs_and_idx:
        base = (idx // 8) * 8
        block = ref[pl.ds(base, 8), :]  # [8, N]
        blocks.append(block)
        # Cast each mask BEFORE the concat: Mosaic cannot concat/bitcast
        # i1 vectors.
        sels.append((jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
                     == (idx - base)).astype(block.dtype))
    block = blocks[0] if len(blocks) == 1 else \
        jnp.concatenate(blocks, axis=0)
    sel = sels[0] if len(sels) == 1 else jnp.concatenate(sels, axis=1)
    return jnp.dot(sel, block, preferred_element_type=jnp.float32)


def _gru_combine(gx, gh, h, units):
    """Reset-after GRU gate math from precomputed projections gx, gh."""
    r = jax.nn.sigmoid(gx[:, :units] + gh[:, :units])
    z = jax.nn.sigmoid(gx[:, units:2 * units] + gh[:, units:2 * units])
    n = jnp.tanh(gx[:, 2 * units:] + r * gh[:, 2 * units:])
    return (1.0 - z) * n + z * h


def _gh_dense(h, wh, bh):
    """Recurrent projection gh = h @ wh + bh.  Reset-after GRUs make this a
    pure function of h, so the kernel can issue it for step t+1 right after
    h_t is produced — off the loop-carried serial chain."""
    return jnp.dot(h.astype(wh.dtype), wh,
                   preferred_element_type=jnp.float32) + bh


def _gru_pre(gx, h, wh, bh, units):
    """GRU update from a precomputed input projection gx = x @ wx + bx."""
    return _gru_combine(gx, _gh_dense(h, wh, bh), h, units)


def _argmax_packed(scores):
    """Single-reduction argmax for the stochastic sampling path.

    Maps the f32 scores through the monotone float->int32 total-order
    transform (``s ^ ((s >> 31) & 0x7fffffff)``), clears the 8 mantissa
    LSBs, and embeds the lane index there: ONE cross-lane max then yields
    both the winner and its index — replacing the max-reduce + MXU
    mask-dot pair on the latency-bound serial chain.

    Quantizes the comparison to the top 24 bits and breaks ties toward the
    HIGHEST lane; with continuous Gumbel noise a winner flip requires the
    top-2 scores within one quantization bucket (~2^-16 relative — rare
    and perceptually nil for sampling), so this rides only
    stochastic-compiled kernels (exact equivalence runs compile with
    stochastic=False and keep the min-reduction argmax).  Measured +2% on
    the B=1 tile-sparse chain (v5e: 1.051 -> 1.030 us/sample).
    """
    s = jax.lax.bitcast_convert_type(scores, jnp.int32)
    key = s ^ ((s >> 31) & jnp.int32(0x7FFFFFFF))
    lanes = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    packed = (key & jnp.int32(-256)) | lanes
    m = jnp.max(packed, axis=1, keepdims=True)
    return m & jnp.int32(255)


ROW_BLOCK = 16    # sparse tile rows (h-dim); LPCNet prunes rows in 16s
COL_BLOCK = 128   # sparse tile cols (gate-dim); one TPU lane tile


def tile_sparse_pattern(mask: np.ndarray):
    """Static keep-pattern of a [H, 3H] recurrent mask at TPU tile
    granularity ([ROW_BLOCK x COL_BLOCK] tiles).

    Returns (pattern, kept_fraction): ``pattern[j]`` is the tuple of kept
    row-block indices for output column group ``j``; a tile is kept iff any
    of its entries is nonzero.  Returns (None, 1.0) when nothing is pruned
    at tile granularity (sparse compute would only add overhead).
    """
    mask = np.asarray(mask)
    H, G = mask.shape
    if H % ROW_BLOCK != 0 or G % COL_BLOCK != 0:
        return None, 1.0  # not tile-divisible; use the dense path
    tiles = mask.reshape(H // ROW_BLOCK, ROW_BLOCK,
                         G // COL_BLOCK, COL_BLOCK)
    keep = np.any(tiles != 0, axis=(1, 3))  # [rows, cols]
    kept = float(keep.mean())
    if kept >= 1.0:
        return None, 1.0
    pattern = tuple(
        tuple(int(i) for i in np.flatnonzero(keep[:, j]))
        for j in range(keep.shape[1])
    )
    return pattern, kept


def _runs(rows):
    """Coalesce a sorted index tuple into (start, length) runs: the kernel
    is latency-bound on op count, so one slice per contiguous run beats one
    slice per row block."""
    out = []
    for i in rows:
        if out and out[-1][0] + out[-1][1] == i:
            out[-1] = (out[-1][0], out[-1][1] + 1)
        else:
            out.append((i, 1))
    return out


def merge_pattern(pattern, factor: int):
    """Merge ``factor`` adjacent COL_BLOCK groups of a tile keep-pattern
    into one wide group whose row set is the union.

    Wider groups trade extra VMEM streaming (union rows x wider slab,
    zeros included) for FEWER serial ops in the latency-bound B=1 kernel:
    one gather+dot per wide group instead of one per 128-lane group.
    """
    assert len(pattern) % factor == 0
    return tuple(
        tuple(sorted(set().union(*pattern[j * factor:(j + 1) * factor])))
        for j in range(len(pattern) // factor)
    )


def _compact_sparse_wh(wh_masked: jnp.ndarray, pattern,
                       group_lanes: int = COL_BLOCK) -> jnp.ndarray:
    """Concatenate kept [ROW_BLOCK, group_lanes] tiles into one
    [R, group_lanes] slab (groups in order, each group's kept row blocks in
    order).  ``pattern`` must already be merged to ``group_lanes`` width."""
    slabs = []
    for j, rows in enumerate(pattern):
        for i in rows:
            slabs.append(wh_masked[i * ROW_BLOCK:(i + 1) * ROW_BLOCK,
                                   j * group_lanes:(j + 1) * group_lanes])
    if not slabs:  # fully pruned (degenerate); keep a zero row for shape
        return jnp.zeros((ROW_BLOCK, group_lanes), wh_masked.dtype)
    return jnp.concatenate(slabs, axis=0)


def _gh_sparse(h, wh_sp_ref, bh, pattern, batch,
               group_lanes: int = COL_BLOCK):
    """Sparse recurrent projection: the matmul restricted to kept tiles.

    Streams only ``kept_fraction`` of the recurrent weights from VMEM: for
    each ``group_lanes``-wide gate column group, the contributing 16-row
    blocks of h are gathered (static lane slices, contiguous runs
    coalesced) and hit one [B, 16k] x [16k, group_lanes] matmul against the
    compacted slab.
    """
    wdt = wh_sp_ref.dtype
    outs = []
    off = 0
    for j, rows in enumerate(pattern):
        if not rows:
            outs.append(jnp.zeros((batch, group_lanes), jnp.float32))
            continue
        segs = [h[:, s * ROW_BLOCK:(s + n) * ROW_BLOCK]
                for s, n in _runs(rows)]
        hg = (segs[0] if len(segs) == 1
              else jnp.concatenate(segs, axis=1)).astype(wdt)
        k = len(rows) * ROW_BLOCK
        outs.append(jnp.dot(hg, wh_sp_ref[pl.ds(off, k), :],
                            preferred_element_type=jnp.float32))
        off += k
    return (outs[0] if len(outs) == 1
            else jnp.concatenate(outs, axis=1)) + bh


def _gru_pre_sparse(gx, h, wh_sp_ref, bh, units, pattern, batch,
                    group_lanes: int = COL_BLOCK):
    """GRU update with the recurrent matmul restricted to kept tiles."""
    gh = _gh_sparse(h, wh_sp_ref, bh, pattern, batch,
                    group_lanes=group_lanes)
    return _gru_combine(gx, gh, h, units)


def _gru(x, h, wx, wh, bx, bh, units):
    gx = jnp.dot(x.astype(wx.dtype), wx,
                 preferred_element_type=jnp.float32) + bx
    gh = jnp.dot(h.astype(wh.dtype), wh,
                 preferred_element_type=jnp.float32) + bh
    r = jax.nn.sigmoid(gx[:, :units] + gh[:, :units])
    z = jax.nn.sigmoid(gx[:, units:2 * units] + gh[:, units:2 * units])
    n = jnp.tanh(gx[:, 2 * units:] + r * gh[:, 2 * units:])
    return (1.0 - z) * n + z * h


def _make_kernel(frame_size: int, lpc_order: int, gru_a: int, gru_b: int,
                 cond_dim: int, embed_dim: int, batch: int,
                 stochastic: bool = True, sparse_pattern=None,
                 fuse_embed: bool = False, hoist_noise: bool = False,
                 unroll: int = 1, sparse_group_lanes: int = COL_BLOCK,
                 pre_rec: bool = False, packed_argmax: bool = False,
                 vpu_emb: bool = False, inner_bias: bool = False,
                 ablate: frozenset = frozenset()):
    def kernel(
        # frame-rate inputs (one frame per grid step)
        cond_ref, lpc_ref, temp_ref, seed_ref,
        # weights (full arrays, VMEM-resident across the grid).  With
        # fuse_embed the emb_* refs hold the PRE-FUSED tables
        # emb_X @ gru_a_wx[embed-rows] ([256, 3*gru_a] each) and the gx_a
        # contribution is three dynamic row gathers instead of one-hot
        # matmuls — nothing of gru_a_wx's embedding rows streams per sample.
        emb_sig_ref, emb_pred_ref, emb_exc_ref,
        gru_a_wx_ref, gru_a_wh_ref, gru_a_bx_ref, gru_a_bh_ref,
        gru_b_wx_ref, gru_b_wh_ref, gru_b_bx_ref, gru_b_bh_ref,
        out1_w_ref, out1_g_ref, out_ib_ref, out_b_ref,
        # initial state (read at step 0)
        h_a0_ref, h_b0_ref, sig_mem0_ref, exc0_ref,
        # outputs
        sig_out_ref, h_a_out_ref, h_b_out_ref, sig_mem_out_ref, exc_out_ref,
        # scratch state (persists across grid steps)
        h_a_s, h_b_s, sig_mem_s, exc_s, *extra_s,
    ):
        t = pl.program_id(0)
        gumbel_s = extra_s[0] if hoist_noise else None

        @pl.when(t == 0)
        def _init():
            h_a_s[...] = h_a0_ref[...]
            h_b_s[...] = h_b0_ref[...]
            sig_mem_s[...] = sig_mem0_ref[...]
            exc_s[...] = exc0_ref[...]

        if stochastic:
            pltpu.prng_seed(seed_ref[pl.program_id(0)])
            if hoist_noise:
                # The whole frame's Gumbel noise is drawn and transformed
                # ONCE per frame (vectorized over all samples); the per-
                # sample serial chain then only pays an aligned 8-row load
                # + one-hot row select instead of prng + bitcasts + two
                # transcendentals every sample.
                bits = pltpu.prng_random_bits((frame_size, MULAW_LEVELS))
                bits24 = pltpu.bitcast(
                    pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32
                )
                u = bits24.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-9
                # Tail cap: see vocoder/net.py NOISE_CAP (kills the rare
                # huge draws that crackle through post-speech silence).
                gumbel_s[...] = jnp.minimum(-jnp.log(-jnp.log(u)), 8.0)

        cond = cond_ref[0]          # [B, cond_dim]
        lpc = lpc_ref[0]            # [B, lpc_order]
        temp = temp_ref[0]          # [B, 1]
        greedy = temp[0, 0] < 0.0

        # The conditioning vector is constant within a frame: its input-gate
        # contribution for both GRUs is computed ONCE per frame, saving the
        # cond rows of Wx from streaming through the MXU on every sample.
        emb_rows = 3 * embed_dim
        cond_w = cond.astype(gru_a_wx_ref.dtype)
        gx_a_cond = jnp.dot(cond_w, gru_a_wx_ref[pl.ds(emb_rows, cond_dim), :],
                            preferred_element_type=jnp.float32) \
            + gru_a_bx_ref[...]
        gx_b_cond = jnp.dot(cond_w, gru_b_wx_ref[pl.ds(gru_a, cond_dim), :],
                            preferred_element_type=jnp.float32) \
            + gru_b_bx_ref[...]

        # Loop-invariant vectors, hoisted off the per-sample serial chain.
        lanes = jax.lax.broadcasted_iota(jnp.int32, (batch, MULAW_LEVELS), 1)
        iota8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
        # Column iota for the tie-free argmax dot (stochastic path).
        lanes_col = jax.lax.broadcasted_iota(
            jnp.int32, (MULAW_LEVELS, 1), 0).astype(jnp.float32)
        # LPC taps as an MXU column: at B=1 a [1,16]x[16,1] dot beats the
        # VPU cross-lane reduce (log-depth shuffle chain) for the
        # prediction.  Transposed once per frame, off the sample chain.
        lpc_col = lpc.reshape(lpc_order, 1) if batch == 1 else None

        # pre_rec: reset-after GRUs make gh = h @ wh + bh a pure function
        # of h, so the projection for step t+1 is issued right after h_t
        # lands and rides the loop carry — its latency hides behind the
        # rest of the iteration instead of heading the serial chain.
        # BOTH modes measured negative on v5e (sparse B=1): True (carry
        # both GRUs, 9+1 vregs) 1.05 -> 1.15 us/sample; "b" (carry only
        # GRU-B's 1 vreg) 0.88 -> 1.01 — Mosaic already overlaps the gh
        # dots with the embedding front chain, and loop-carried vregs
        # disrupt that schedule.  Kept as flags for future configs.
        def gh_a_of(h):
            if sparse_pattern is not None:
                return _gh_sparse(h, gru_a_wh_ref, gru_a_bh_ref[...],
                                  sparse_pattern, batch,
                                  group_lanes=sparse_group_lanes)
            return _gh_dense(h, gru_a_wh_ref[...], gru_a_bh_ref[...])

        def gh_b_of(h):
            return _gh_dense(h, gru_b_wh_ref[...], gru_b_bh_ref[...])

        def step(i, carry):
            # pre_rec=True carries both projections; pre_rec="b" carries
            # only GRU-B's [1, 3*gru_b] (1 vreg — the full-mode gh_a carry
            # is 9 vregs and measured negative).
            if pre_rec is True:
                gh_a_p, gh_b_p = carry
            elif pre_rec == "b":
                gh_a_p, gh_b_p = None, carry
            else:
                gh_a_p, gh_b_p = None, None
            sig_mem = sig_mem_s[...]
            if "pred" in ablate:
                pred = sig_mem[:, :1]
            elif batch == 1:
                pred = -jnp.dot(sig_mem, lpc_col,
                                preferred_element_type=jnp.float32)  # [1,1]
            else:
                pred = -jnp.sum(sig_mem * lpc, axis=1, keepdims=True)  # [B,1]

            wdt = emb_sig_ref.dtype
            # NB: keep these two encodes SEPARATE — fusing them via a
            # [B,2] concat measured slower (the concat serializes two
            # otherwise-overlappable transcendental chains).
            if "encode" in ablate:
                sig_idx = (sig_mem[:, :1] > 0).astype(jnp.int32)
                pred_idx = (pred > 0).astype(jnp.int32)
            else:
                sig_idx = _mulaw_encode(sig_mem[:, :1])  # [B,1] int32
                pred_idx = _mulaw_encode(pred)           # [B,1]

            if "gather" in ablate:
                gx_a = gx_a_cond + (sig_idx + pred_idx
                                    + exc_s[...]).astype(jnp.float32)
            elif fuse_embed:
                # Row gathers from the fused [256, 3*gru_a] tables: streams
                # 3 rows/sample instead of the three embedding tables plus
                # gru_a_wx's embedding rows (the per-sample bandwidth hog
                # at small batch).
                rows = []
                for b in range(batch):
                    rows.append(_gather_rows_sum((
                        (emb_sig_ref, sig_idx[b, 0]),
                        (emb_pred_ref, pred_idx[b, 0]),
                        (emb_exc_ref, exc_s[b, 0]),
                    ), vpu=vpu_emb))
                gx_emb = rows[0] if batch == 1 else \
                    jnp.concatenate(rows, axis=0)
                gx_a = gx_emb + gx_a_cond
            else:
                oh_sig = _one_hot(sig_idx, MULAW_LEVELS, wdt)
                oh_pred = _one_hot(pred_idx, MULAW_LEVELS, wdt)
                oh_exc = _one_hot(exc_s[...], MULAW_LEVELS, wdt)

                e_sig = jnp.dot(oh_sig, emb_sig_ref[...],
                                preferred_element_type=jnp.float32)
                e_pred = jnp.dot(oh_pred, emb_pred_ref[...],
                                 preferred_element_type=jnp.float32)
                e_exc = jnp.dot(oh_exc, emb_exc_ref[...],
                                preferred_element_type=jnp.float32)

                x_emb = jnp.concatenate([e_sig, e_pred, e_exc], axis=1)
                gx_a = jnp.dot(x_emb.astype(gru_a_wx_ref.dtype),
                               gru_a_wx_ref[pl.ds(0, emb_rows), :],
                               preferred_element_type=jnp.float32) + gx_a_cond
            if "grua" in ablate:
                h_a = jnp.tanh(gx_a[:, :gru_a])
            elif pre_rec is True:
                h_a = _gru_combine(gx_a, gh_a_p, h_a_s[...], gru_a)
            elif sparse_pattern is not None:
                h_a = _gru_pre_sparse(gx_a, h_a_s[...], gru_a_wh_ref,
                                      gru_a_bh_ref[...], gru_a,
                                      sparse_pattern, batch,
                                      group_lanes=sparse_group_lanes)
            else:
                h_a = _gru_pre(gx_a, h_a_s[...], gru_a_wh_ref[...],
                               gru_a_bh_ref[...], gru_a)
            h_a_s[...] = h_a
            gh_a_n = gh_a_of(h_a) if pre_rec is True else None

            gx_b = jnp.dot(h_a.astype(gru_b_wx_ref.dtype),
                           gru_b_wx_ref[pl.ds(0, gru_a), :],
                           preferred_element_type=jnp.float32) + gx_b_cond
            if "grub" in ablate:
                h_b = jnp.tanh(gx_b[:, :gru_b])
            elif pre_rec:
                h_b = _gru_combine(gx_b, gh_b_p, h_b_s[...], gru_b)
            else:
                h_b = _gru_pre(gx_b, h_b_s[...], gru_b_wh_ref[...],
                               gru_b_bh_ref[...], gru_b)
            h_b_s[...] = h_b
            gh_b_n = gh_b_of(h_b) if pre_rec else None

            # The dual output heads ride ONE MXU dispatch: out1_w_ref holds
            # [gb, 2*256] = concat(out1_w, out2_w) and out1_g_ref the
            # matching [1, 2*256] gains; the kernel is latency-bound on its
            # serial op chain, so fewer dispatches beat smaller ones.
            if "head" in ablate:
                logits = h_b[:, :1] + out_b_ref[...]
            else:
                h_b_w = h_b.astype(out1_w_ref.dtype)
                pre = jnp.dot(h_b_w, out1_w_ref[...],
                              preferred_element_type=jnp.float32)
                if inner_bias:
                    # Per-channel dual-FC biases INSIDE the tanh: xiph's
                    # MDense head (imported checkpoints, vocoder/interop.py).
                    # Static flag so native checkpoints pay no extra op on
                    # the serial chain.
                    pre = pre + out_ib_ref[...]
                t12 = jnp.tanh(pre) * out1_g_ref[...]
                logits = (t12[:, :MULAW_LEVELS] + t12[:, MULAW_LEVELS:]
                          + out_b_ref[...])

            if stochastic and "noise" not in ablate:
                if hoist_noise:
                    base = (i // 8) * 8
                    blk = gumbel_s[pl.ds(base, 8), :]          # [8, 256]
                    sel = (iota8 == (i - base)).astype(jnp.float32)
                    gumbel = jnp.dot(sel, blk,
                                     preferred_element_type=jnp.float32)
                else:
                    bits = pltpu.prng_random_bits((batch, MULAW_LEVELS))
                    # Mosaic lacks uint32->f32 casts; route through int32
                    # (the top 8 bits are shifted out, so the value is
                    # sign-safe).
                    bits24 = pltpu.bitcast(
                        pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32
                    )
                    u = bits24.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-9
                    gumbel = jnp.minimum(-jnp.log(-jnp.log(u)), 8.0)
                scores = jnp.where(greedy, logits, logits * temp + gumbel)
            else:
                scores = logits

            if "argmax" in ablate:
                new_exc = (scores[:, :1] > 0).astype(jnp.int32)
            elif stochastic and packed_argmax:
                new_exc = _argmax_packed(scores)
            elif stochastic and batch == 1:
                # Tie-free argmax: with continuous Gumbel noise the maximum
                # is unique (measure zero otherwise), so ONE cross-lane max
                # + an MXU dot of the 0/1 mask against the lane iota
                # replaces the second (min) cross-lane reduction.  On a tie
                # the dot sums the tied indices; the clamp only bounds the
                # result, it does NOT reproduce argmax's lowest-index rule.
                # That is fine here because (a) the production path always
                # passes temperature >= 1 (net.py derives it from corr), so
                # this branch always has noise, and (b) exact-equivalence
                # runs (greedy, temp < 0) must compile with stochastic=False
                # to get the min-reduction form below.  Exact logit ties
                # WITH noise remain measure-zero.
                m = jnp.max(scores, axis=1, keepdims=True)
                hit = (scores >= m).astype(jnp.float32)
                new_exc = jnp.minimum(
                    jnp.dot(hit, lanes_col,
                            preferred_element_type=jnp.float32),
                    float(MULAW_LEVELS - 1),
                ).astype(jnp.int32)
            else:
                m = jnp.max(scores, axis=1, keepdims=True)
                new_exc = jnp.min(
                    jnp.where(scores >= m, lanes, MULAW_LEVELS), axis=1,
                    keepdims=True,
                ).astype(jnp.int32)
            exc_s[...] = new_exc

            if "decode" in ablate:
                e = new_exc.astype(jnp.float32) * (1.0 / 128.0)
            else:
                e = _mulaw_decode(new_exc)
            sample = jnp.clip(pred + e, -1.0, 1.0)  # [B,1]
            if "shift" in ablate:
                sig_mem_s[...] = sig_mem + sample  # keeps the dependency
            else:
                sig_mem_s[...] = jnp.concatenate(
                    [sample, sig_mem[:, :-1]], axis=1
                )
            if "store" not in ablate:
                sig_out_ref[0, i, :] = sample[:, 0]
            if pre_rec is True:
                return (gh_a_n, gh_b_n)
            if pre_rec == "b":
                return gh_b_n
            return 0

        if pre_rec is True:
            carry0 = (gh_a_of(h_a_s[...]), gh_b_of(h_b_s[...]))
        elif pre_rec == "b":
            carry0 = gh_b_of(h_b_s[...])
        else:
            carry0 = 0
        if unroll > 1:
            jax.lax.fori_loop(0, frame_size, step, carry0, unroll=unroll)
        else:
            jax.lax.fori_loop(0, frame_size, step, carry0)

        h_a_out_ref[...] = h_a_s[...]
        h_b_out_ref[...] = h_b_s[...]
        sig_mem_out_ref[...] = sig_mem_s[...]
        exc_out_ref[...] = exc_s[...]

    return kernel


@partial(jax.jit, static_argnames=("frame_size", "stochastic",
                                   "weight_dtype", "sparse_pattern",
                                   "fuse_embed", "hoist_noise", "unroll",
                                   "sparse_group_lanes", "pre_rec",
                                   "packed_argmax", "vpu_emb", "ablate"))
def _sampler_call(cond, lpc, temp, seeds, weights, h_a0, h_b0, sig_mem0,
                  exc0, frame_size: int, stochastic: bool = True,
                  weight_dtype=jnp.bfloat16, sparse_pattern=None,
                  fuse_embed: bool = False, hoist_noise: bool = False,
                  unroll: int = 1, sparse_group_lanes: int = COL_BLOCK,
                  pre_rec: bool = False, packed_argmax: bool = False,
                  vpu_emb: bool = False,
                  ablate: frozenset = frozenset()):
    """cond [T,B,cd], lpc [T,B,16], temp [T,B,1], seeds [T] int32."""
    T, B, cd = cond.shape
    lpc_order = lpc.shape[-1]
    gru_a = h_a0.shape[-1]
    gru_b = h_b0.shape[-1]
    embed_dim = weights["emb_sig"].shape[-1]

    if sparse_pattern is not None and sparse_group_lanes != COL_BLOCK:
        # Widen column groups: unions of kept rows, fewer serial gather+dot
        # ops per sample at the cost of streaming the zeros inside union
        # rows.  The slab compaction below uses the SAME merged pattern.
        sparse_pattern = merge_pattern(sparse_pattern,
                                       sparse_group_lanes // COL_BLOCK)

    # Imported xiph checkpoints carry per-channel dual-FC biases inside the
    # tanh (MDense); presence of the key is part of the pytree structure, so
    # this is a static branch.
    inner_bias = "fc_out1_b" in weights

    kernel = _make_kernel(frame_size, lpc_order, gru_a, gru_b, cd,
                          embed_dim, B, stochastic=stochastic,
                          sparse_pattern=sparse_pattern,
                          fuse_embed=fuse_embed, hoist_noise=hoist_noise,
                          unroll=unroll,
                          sparse_group_lanes=sparse_group_lanes,
                          pre_rec=pre_rec, packed_argmax=packed_argmax,
                          vpu_emb=vpu_emb, inner_bias=inner_bias,
                          ablate=ablate)

    def frame_spec(shape):
        return pl.BlockSpec((1,) + shape, lambda t: (t,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def full(x):
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    weight_order = [
        "emb_sig", "emb_pred", "emb_exc",
        "gru_a_wx", "gru_a_wh", "gru_a_bx", "gru_a_bh",
        "gru_b_wx", "gru_b_wh", "gru_b_bx", "gru_b_bh",
        "fc_out1_w", "fc_out1_g", "fc_out_ib", "fc_out_b",
    ]
    # Large matrices stream from VMEM every sample step, which is the
    # kernel's bottleneck at small batch — bf16 halves that traffic (MXU
    # accumulation stays f32 via preferred_element_type). Biases/gains are
    # tiny and stay f32.
    matrix_keys = {"emb_sig", "emb_pred", "emb_exc", "gru_a_wx", "gru_a_wh",
                   "gru_b_wx", "gru_b_wh", "fc_out1_w"}
    fused = {
        # Dual output heads fold into one MXU dispatch (see kernel).
        "fc_out1_w": jnp.concatenate(
            [jnp.asarray(weights["fc_out1_w"], jnp.float32),
             jnp.asarray(weights["fc_out2_w"], jnp.float32)], axis=1),
        "fc_out1_g": jnp.concatenate(
            [jnp.asarray(weights["fc_out1_g"], jnp.float32),
             jnp.asarray(weights["fc_out2_g"], jnp.float32)], axis=-1),
        # Inner (pre-tanh) per-channel biases; zeros placeholder keeps the
        # kernel signature fixed when the checkpoint has none (static
        # inner_bias flag elides the add).
        "fc_out_ib": (jnp.concatenate(
            [jnp.asarray(weights["fc_out1_b"], jnp.float32),
             jnp.asarray(weights["fc_out2_b"], jnp.float32)], axis=-1)
            if inner_bias else jnp.zeros(2 * MULAW_LEVELS, jnp.float32)),
    }
    if fuse_embed:
        # Pre-fuse each embedding table with its gru_a_wx row band:
        # (one_hot @ emb) @ wx_rows == one_hot @ (emb @ wx_rows), so a
        # single row gather of the fused [256, 3*gru_a] table replaces the
        # embedding matmuls AND the wx embedding-row matmul per sample.
        wx = jnp.asarray(weights["gru_a_wx"], jnp.float32)
        for n, key in enumerate(("emb_sig", "emb_pred", "emb_exc")):
            emb = jnp.asarray(weights[key], jnp.float32)
            fused[key] = emb @ wx[n * embed_dim:(n + 1) * embed_dim, :]

    weight_vals = []
    for k in weight_order:
        w = fused[k] if k in fused else weights[k]
        if k == "gru_a_wh":
            w = w * weights["gru_a_mask"]
            if sparse_pattern is not None:
                # Only the kept tiles ship to (and stream from) VMEM.
                w = _compact_sparse_wh(w, sparse_pattern,
                                       group_lanes=sparse_group_lanes)
        if w.ndim == 1:
            w = w[None, :]  # biases as [1, n] rows for clean broadcasting
        dtype = weight_dtype if k in matrix_keys else jnp.float32
        weight_vals.append(jnp.asarray(w, dtype))

    out_shapes = (
        jax.ShapeDtypeStruct((T, frame_size, B), jnp.float32),
        jax.ShapeDtypeStruct((B, gru_a), jnp.float32),
        jax.ShapeDtypeStruct((B, gru_b), jnp.float32),
        jax.ShapeDtypeStruct((B, lpc_order), jnp.float32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
    )
    out_specs = (
        pl.BlockSpec((1, frame_size, B), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, gru_a), lambda t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, gru_b), lambda t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, lpc_order), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
    )

    in_specs = (
        [frame_spec((B, cd)), frame_spec((B, lpc_order)), frame_spec((B, 1)),
         # Whole seeds vector in SMEM (rank-1 blocks must cover the array).
         pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [full(w) for w in weight_vals]
        + [full(h_a0), full(h_b0), full(sig_mem0),
           pl.BlockSpec(memory_space=pltpu.VMEM)]
    )

    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((B, gru_a), jnp.float32),
            pltpu.VMEM((B, gru_b), jnp.float32),
            pltpu.VMEM((B, lpc_order), jnp.float32),
            pltpu.VMEM((B, 1), jnp.int32),
        ] + ([pltpu.VMEM((frame_size, MULAW_LEVELS), jnp.float32)]
             if hoist_noise else []),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_INTERPRET,
    )(cond, lpc, temp, seeds, *weight_vals, h_a0, h_b0, sig_mem0, exc0)


def sampler_frames_pallas(model, params, carry, cond_all, lpc_all,
                          temperature, seeds, frame_size: int = 160,
                          stochastic: bool = True, weight_dtype=None,
                          sparse_pattern=None, fuse_embed=None,
                          hoist_noise=None, unroll: int = 1,
                          sparse_group_lanes=None, pre_rec=None,
                          packed_argmax=None, vpu_emb: bool = True,
                          ablate: str = ""):
    """Synthesize T frames with the Pallas sampler.

    carry: (h_a [B,ga], h_b [B,gb], sig_mem [B,16], exc_idx [B]).
    cond_all [B,T,cd]; lpc_all [B,T,16]; temperature [B,T,1] (negative for
    greedy argmax); seeds [T] int32.
    sparse_pattern: static tile keep-pattern from ``tile_sparse_pattern``
    (computed OUTSIDE jit on the concrete gru_a_mask) — restricts the GRU-A
    recurrent matmul to kept [16, 128] tiles.
    Returns ((h_a, h_b, sig_mem, exc_idx), sig [B, T*frame_size]).
    """
    del model
    h_a, h_b, sig_mem, exc_idx = carry
    if weight_dtype is None:
        # Small batches are weight-streaming-bound (bf16 wins ~40%); large
        # batches amortize the streaming and f32 avoids the cast overhead.
        weight_dtype = jnp.bfloat16 if cond_all.shape[0] < 32 else jnp.float32
    if fuse_embed is None:
        # Row gathers cost 3 dynamic slices per stream per sample; they beat
        # streaming the embedding weights only while the batch is small.
        fuse_embed = cond_all.shape[0] <= 4
    if hoist_noise is None:
        # Measured on TPU v5e: the per-sample prng + gumbel transform sits
        # OFF the loop-carried dependency chain, so hoisting it per-frame
        # buys nothing (56.5x -> 55.6x, slightly negative: the one-hot row
        # select adds an MXU dispatch ON the chain).  Kept as an option for
        # future configs; requires B == 1 and 8-aligned frames.
        hoist_noise = False
    hoist_noise = bool(hoist_noise and stochastic and cond_all.shape[0] == 1
                       and frame_size % 8 == 0)
    if sparse_group_lanes is None:
        # Per-GATE column groups (width = gru_a units) measured fastest on
        # v5e with the shipped 20% mask (57.8x vs 56.4x at 128 lanes): one
        # gather+dot per gate instead of per 128-lane group, at a modest
        # extra streaming cost for the union rows' zeros.
        ga = h_a.shape[-1]
        sparse_group_lanes = ga if ga % COL_BLOCK == 0 else COL_BLOCK
    if pre_rec is None:
        # Measured NEGATIVE on v5e (1.05 -> 1.15 us/sample sparse B=1):
        # carrying next-step gh through the fori_loop costs more than the
        # head-of-chain projection it hides — Mosaic already overlaps the
        # gh dot with the gx embedding chain.  Kept as a flag for future
        # configs (e.g. much larger gru_a where the projection dominates).
        pre_rec = False
    if packed_argmax is None:
        # Single-reduction argmax needs noise to wash out its highest-lane
        # tie-breaking and 24-bit quantization (see _argmax_packed); exact
        # equivalence (greedy) runs keep the min-reduction form.
        packed_argmax = bool(stochastic)
    cond = jnp.moveaxis(jnp.asarray(cond_all, jnp.float32), 1, 0)
    lpc = jnp.moveaxis(jnp.asarray(lpc_all, jnp.float32), 1, 0)
    temp = jnp.moveaxis(jnp.asarray(temperature, jnp.float32), 1, 0)
    sig, h_a, h_b, sig_mem, exc = _sampler_call(
        cond, lpc, temp, jnp.asarray(seeds, jnp.int32), params,
        jnp.asarray(h_a, jnp.float32), jnp.asarray(h_b, jnp.float32),
        jnp.asarray(sig_mem, jnp.float32),
        jnp.asarray(exc_idx, jnp.int32).reshape(-1, 1),
        frame_size=frame_size, stochastic=stochastic,
        weight_dtype=weight_dtype, sparse_pattern=sparse_pattern,
        fuse_embed=bool(fuse_embed), hoist_noise=bool(hoist_noise),
        unroll=unroll, sparse_group_lanes=sparse_group_lanes,
        pre_rec=bool(pre_rec), packed_argmax=bool(packed_argmax),
        vpu_emb=bool(vpu_emb),
        ablate=frozenset(a for a in ablate.split(",") if a),
    )
    T, F, B = sig.shape
    sig = jnp.moveaxis(sig.reshape(T * F, B), 0, 1)
    return (h_a, h_b, sig_mem, exc[:, 0]), sig


# ---------------------------------------------------------------------------
# Bunched sampler: S samples per sample-rate-network step (B=1 latency path).
# The GRU-A/GRU-B recurrence runs at 16 kHz / S; per bunch one fused output
# dot yields all S dual-FC heads, and sub-samples j >= 1 add row-gathered
# [256, 256] correction embeddings of (previous intra-bunch excitation, own
# LPC prediction).  Mirrors LPCNetModel.bunch_step (vocoder/net.py).
# ---------------------------------------------------------------------------


def _make_bunched_kernel(frame_size: int, lpc_order: int, gru_a: int,
                         gru_b: int, cond_dim: int, embed_dim: int,
                         bunch: int, batch: int = 1,
                         stochastic: bool = True, sparse_pattern=None,
                         sparse_group_lanes: int = COL_BLOCK,
                         packed_argmax: bool = False,
                         vpu_corr: bool = False, fma_pred: bool = False,
                         vpu_emb: bool = False, corr_rep: bool = False,
                         inner_bias: bool = False,
                         ablate: frozenset = frozenset()):
    S = bunch
    n_emb = 2 * S + 1
    steps = frame_size // S
    fma_pred = fma_pred and batch == 1 and S > 1
    # Small batches use dynamic row gathers (3 slices/table, latency play);
    # large batches amortize streaming, so one-hot matmuls against STACKED
    # tables (one ref) feed the MXU instead.
    fuse_gather = batch <= 4

    def kernel(*refs):
        it = iter(refs)
        cond_ref = next(it); lpc_ref = next(it)
        temp_ref = next(it); seed_ref = next(it)
        emb_refs = [next(it) for _ in range(n_emb if fuse_gather else 1)]
        gru_a_wx_ref = next(it); gru_a_wh_ref = next(it)
        gru_a_bx_ref = next(it); gru_a_bh_ref = next(it)
        gru_b_wx_ref = next(it); gru_b_wh_ref = next(it)
        gru_b_bx_ref = next(it); gru_b_bh_ref = next(it)
        out_w_ref = next(it); out_g_ref = next(it)
        out_ib_ref = next(it); out_b_ref = next(it)
        corr_refs = [(next(it), next(it)) if fuse_gather else (next(it),)
                     for _ in range(S - 1)]
        h_a0_ref = next(it); h_b0_ref = next(it)
        sig_mem0_ref = next(it); exc0_ref = next(it)
        sig_out_ref = next(it); h_a_out_ref = next(it); h_b_out_ref = next(it)
        sig_mem_out_ref = next(it); exc_out_ref = next(it)
        h_a_s = next(it); h_b_s = next(it); sig_mem_s = next(it)
        exc_s = next(it)

        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            h_a_s[...] = h_a0_ref[...]
            h_b_s[...] = h_b0_ref[...]
            sig_mem_s[...] = sig_mem0_ref[...]
            exc_s[...] = exc0_ref[...]

        if stochastic:
            pltpu.prng_seed(seed_ref[pl.program_id(0)])

        cond = cond_ref[0]          # [B, cond_dim]
        lpc = lpc_ref[0]            # [B, lpc_order]
        temp = temp_ref[0]          # [B, 1]
        greedy = temp[0, 0] < 0.0

        # gru_a_wx_ref holds ONLY the conditioning row band (the embedding
        # rows live pre-fused inside the tables): [cond_dim, 3*gru_a].
        cond_w = cond.astype(gru_a_wx_ref.dtype)
        gx_a_cond = jnp.dot(cond_w, gru_a_wx_ref[...],
                            preferred_element_type=jnp.float32) \
            + gru_a_bx_ref[...]
        gx_b_cond = jnp.dot(cond_w, gru_b_wx_ref[pl.ds(gru_a, cond_dim), :],
                            preferred_element_type=jnp.float32) \
            + gru_b_bx_ref[...]

        lanes = jax.lax.broadcasted_iota(jnp.int32, (batch, MULAW_LEVELS), 1)
        lanes_col = jax.lax.broadcasted_iota(
            jnp.int32, (MULAW_LEVELS, 1), 0).astype(jnp.float32)
        lpc_col = lpc.reshape(lpc_order, 1) if batch == 1 else None
        if fma_pred:
            # fma_pred: the intra-bunch LPC predictions leave the serial
            # chain's MXU.  ONE [1,16]x[16,S] dot at the head of each step
            # yields p_0 AND the "old samples" partial sums for j>=1
            # (column j is the lpc taps shifted down by j, zero-padded);
            # the j new intra-bunch samples then contribute via <=S-1
            # scalar FMAs, with the newest sample's term applied LAST so
            # the chain from exc_{j-1} is a single multiply-subtract.
            # Loop-invariant (lpc is constant per frame), hoisted here.
            # MEASURED NEGATIVE on v5e (S=4 sparse B=1: 0.66 -> 0.76
            # us/sample): the scalar FMA chain serializes against the
            # sig_mem shift that Mosaic otherwise overlaps with the
            # [1,16]x[16,1] pred dot.  Kept as an off-by-default flag.
            zpad = jnp.zeros((S - 1, 1), jnp.float32)
            lsh = jnp.concatenate(
                [lpc_col] + [jnp.concatenate([lpc_col[j:], zpad[:j]], axis=0)
                             for j in range(1, S)], axis=1)       # [16, S]

        def predict(sig_mem):
            if "pred" in ablate:
                return sig_mem[:, :1]
            if batch == 1:
                return -jnp.dot(sig_mem, lpc_col,
                                preferred_element_type=jnp.float32)  # [1,1]
            return -jnp.sum(sig_mem * lpc, axis=1, keepdims=True)    # [B,1]

        def sample_from(scores):
            if "argmax" in ablate:
                return (scores[:, :1] > 0).astype(jnp.int32)
            if stochastic and packed_argmax:
                return _argmax_packed(scores)
            if stochastic:
                m = jnp.max(scores, axis=1, keepdims=True)
                hit = (scores >= m).astype(jnp.float32)
                return jnp.minimum(
                    jnp.dot(hit, lanes_col,
                            preferred_element_type=jnp.float32),
                    float(MULAW_LEVELS - 1),
                ).astype(jnp.int32)
            m = jnp.max(scores, axis=1, keepdims=True)
            return jnp.min(
                jnp.where(scores >= m, lanes, MULAW_LEVELS), axis=1,
                keepdims=True,
            ).astype(jnp.int32)

        def add_noise(logits):
            if not stochastic or "noise" in ablate:
                return logits
            bits = pltpu.prng_random_bits((batch, MULAW_LEVELS))
            bits24 = pltpu.bitcast(
                pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32
            )
            u = bits24.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-9
            gumbel = jnp.minimum(-jnp.log(-jnp.log(u)), 8.0)
            return jnp.where(greedy, logits, logits * temp + gumbel)

        def step(i, _):
            sig_mem = sig_mem_s[...]
            if fma_pred and "pred" not in ablate:
                po = -jnp.dot(sig_mem, lsh,
                              preferred_element_type=jnp.float32)  # [1,S]
                pred = po[:, :1]
            else:
                pred = predict(sig_mem)

            # One vector encode covers all S signal lags (contiguous in
            # sig_mem); the prediction encode stays separate (independent
            # chain).
            if "encode" in ablate:
                sig_idx = (sig_mem[:, :S] > 0).astype(jnp.int32)
                pred_idx = (pred > 0).astype(jnp.int32)
            else:
                sig_idx = _mulaw_encode(sig_mem[:, :S])   # [B,S] int32
                pred_idx = _mulaw_encode(pred)            # [B,1]

            if "gather" in ablate:
                gx_emb = (jnp.sum(sig_idx, axis=1, keepdims=True) + pred_idx
                          + jnp.sum(exc_s[...], axis=1, keepdims=True)
                          ).astype(jnp.float32)
            elif fuse_gather:
                rows = []
                for b in range(batch):
                    entries = [(emb_refs[j], sig_idx[b, j])
                               for j in range(S)]
                    entries.append((emb_refs[S], pred_idx[b, 0]))
                    entries += [(emb_refs[S + 1 + j], exc_s[b, j])
                                for j in range(S)]
                    rows.append(_gather_rows_sum(tuple(entries),
                                                 vpu=vpu_emb))
                gx_emb = rows[0] if batch == 1 else \
                    jnp.concatenate(rows, axis=0)
            else:
                wdt = emb_refs[0].dtype
                ohs = [_one_hot(sig_idx[:, j:j + 1], MULAW_LEVELS, wdt)
                       for j in range(S)]
                ohs.append(_one_hot(pred_idx, MULAW_LEVELS, wdt))
                ohs += [_one_hot(exc_s[:, j:j + 1], MULAW_LEVELS, wdt)
                        for j in range(S)]
                gx_emb = jnp.dot(jnp.concatenate(ohs, axis=1),
                                 emb_refs[0][...],
                                 preferred_element_type=jnp.float32)
            gx_a = gx_emb + gx_a_cond

            if "grua" in ablate:
                h_a = jnp.tanh(gx_a[:, :gru_a])
            elif sparse_pattern is not None:
                h_a = _gru_pre_sparse(gx_a, h_a_s[...], gru_a_wh_ref,
                                      gru_a_bh_ref[...], gru_a,
                                      sparse_pattern, batch,
                                      group_lanes=sparse_group_lanes)
            else:
                h_a = _gru_pre(gx_a, h_a_s[...], gru_a_wh_ref[...],
                               gru_a_bh_ref[...], gru_a)
            h_a_s[...] = h_a

            gx_b = jnp.dot(h_a.astype(gru_b_wx_ref.dtype),
                           gru_b_wx_ref[pl.ds(0, gru_a), :],
                           preferred_element_type=jnp.float32) + gx_b_cond
            if "grub" in ablate:
                h_b = jnp.tanh(gx_b[:, :gru_b])
            else:
                h_b = _gru_pre(gx_b, h_b_s[...], gru_b_wh_ref[...],
                               gru_b_bh_ref[...], gru_b)
            h_b_s[...] = h_b

            # ALL S dual-FC heads in one MXU dispatch: out_w is
            # [gb, S*2*256], gains match; head j occupies lanes
            # [j*512, (j+1)*512).
            if "head" in ablate:
                t_all = h_b[:, :1] * out_g_ref[...]
            else:
                h_b_w = h_b.astype(out_w_ref.dtype)
                pre_t = jnp.dot(h_b_w, out_w_ref[...],
                                preferred_element_type=jnp.float32)
                if inner_bias:
                    # xiph-style MDense inner biases (static flag: native
                    # checkpoints pay nothing on the serial chain).
                    pre_t = pre_t + out_ib_ref[...]
                t_all = jnp.tanh(pre_t) * out_g_ref[...]

            excs = []
            samples = []
            p = pred
            p_idx = pred_idx
            for j in range(S):
                base = j * 2 * MULAW_LEVELS
                logits = (t_all[:, base:base + MULAW_LEVELS]
                          + t_all[:, base + MULAW_LEVELS:base
                                  + 2 * MULAW_LEVELS]
                          + out_b_ref[:, j * MULAW_LEVELS:
                                      (j + 1) * MULAW_LEVELS])
                if j > 0 and "corr" not in ablate:
                    if fuse_gather:
                        corr_rows = []
                        for b in range(batch):
                            ce_ref, cp_ref = corr_refs[j - 1]
                            corr_rows.append(_gather_rows_sum((
                                (ce_ref, excs[-1][b, 0]),
                                (cp_ref, p_idx[b, 0]),
                            ), vpu=vpu_corr, rep=corr_rep))
                        corr = corr_rows[0] if batch == 1 else \
                            jnp.concatenate(corr_rows, axis=0)
                    else:
                        cref = corr_refs[j - 1][0]
                        wdt = cref.dtype
                        oh = jnp.concatenate(
                            [_one_hot(excs[-1], MULAW_LEVELS, wdt),
                             _one_hot(p_idx, MULAW_LEVELS, wdt)], axis=1)
                        corr = jnp.dot(oh, cref[...],
                                       preferred_element_type=jnp.float32)
                    logits = logits + corr
                new_exc = sample_from(add_noise(logits))
                excs.append(new_exc)
                if "decode" in ablate:
                    e = new_exc.astype(jnp.float32) * (1.0 / 128.0)
                else:
                    e = _mulaw_decode(new_exc)
                sample = jnp.clip(p + e, -1.0, 1.0)  # [B,1]
                samples.append(sample)
                if "shift" in ablate:
                    sig_mem = sig_mem + sample  # keeps the value dependency
                else:
                    sig_mem = jnp.concatenate([sample, sig_mem[:, :-1]],
                                              axis=1)
                if "store" not in ablate:
                    sig_out_ref[0, i * S + j, :] = sample[:, 0]
                if j + 1 < S:
                    if fma_pred and "pred" not in ablate:
                        # p_{j+1} = po[j+1] - sum_k lpc[k]*s_{j-k}; terms
                        # from older (already-resolved) samples first, the
                        # newest last — one FMA on the exc_{j} chain.
                        base = po[:, j + 1:j + 2]
                        for k in range(1, j + 1):
                            base = base - lpc[:, k:k + 1] * samples[j - k]
                        p = base - lpc[:, :1] * sample
                    else:
                        p = predict(sig_mem)
                    if "encode" in ablate:
                        p_idx = (p > 0).astype(jnp.int32)
                    else:
                        p_idx = _mulaw_encode(p)
            sig_mem_s[...] = sig_mem
            exc_s[...] = (excs[0] if S == 1
                          else jnp.concatenate(excs[::-1], axis=1))
            return 0

        jax.lax.fori_loop(0, steps, step, 0)

        h_a_out_ref[...] = h_a_s[...]
        h_b_out_ref[...] = h_b_s[...]
        sig_mem_out_ref[...] = sig_mem_s[...]
        exc_out_ref[...] = exc_s[...]

    return kernel


@partial(jax.jit, static_argnames=("frame_size", "stochastic",
                                   "weight_dtype", "sparse_pattern",
                                   "sparse_group_lanes", "bunch",
                                   "packed_argmax", "vpu_corr", "fma_pred",
                                   "vpu_emb", "corr_rep", "ablate"))
def _bunched_sampler_call(cond, lpc, temp, seeds, weights, h_a0, h_b0,
                          sig_mem0, exc0, frame_size: int, bunch: int,
                          stochastic: bool = True,
                          weight_dtype=jnp.bfloat16, sparse_pattern=None,
                          sparse_group_lanes: int = COL_BLOCK,
                          packed_argmax: bool = False,
                          vpu_corr: bool = False, fma_pred: bool = False,
                          vpu_emb: bool = False, corr_rep: bool = False,
                          ablate: frozenset = frozenset()):
    """cond [T,B,cd], lpc [T,B,16], temp [T,B,1], seeds [T]; exc0 [B,S]."""
    T, B, cd = cond.shape
    S = bunch
    lpc_order = lpc.shape[-1]
    gru_a = h_a0.shape[-1]
    gru_b = h_b0.shape[-1]
    embed_dim = weights["emb_sig"].shape[-1]
    n_emb = 2 * S + 1

    if sparse_pattern is not None and sparse_group_lanes != COL_BLOCK:
        sparse_pattern = merge_pattern(sparse_pattern,
                                       sparse_group_lanes // COL_BLOCK)

    def _ib_key(j, n):
        return f"fc_out{n}_b" if j == 0 else f"fc_out{n}_b_b{j}"

    inner_bias = any(_ib_key(j, n) in weights
                     for j in range(S) for n in (1, 2))

    kernel = _make_bunched_kernel(frame_size, lpc_order, gru_a, gru_b, cd,
                                  embed_dim, S, batch=B,
                                  stochastic=stochastic,
                                  sparse_pattern=sparse_pattern,
                                  sparse_group_lanes=sparse_group_lanes,
                                  packed_argmax=packed_argmax,
                                  vpu_corr=vpu_corr, fma_pred=fma_pred,
                                  vpu_emb=vpu_emb,
                                  corr_rep=corr_rep and B <= 4,
                                  inner_bias=inner_bias,
                                  ablate=ablate)
    fuse_gather = B <= 4
    corr_rep = corr_rep and fuse_gather

    def frame_spec(shape):
        return pl.BlockSpec((1,) + shape, lambda t: (t,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def full(x):
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    # Embedding tables pre-fused with their gru_a_wx row band, in x_a
    # layout order: sig lags 0..S-1, pred, exc lags 0..S-1.
    emb_names = (["emb_sig"]
                 + [f"emb_sig_l{j}" for j in range(1, S)]
                 + ["emb_pred", "emb_exc"]
                 + [f"emb_exc_l{j}" for j in range(1, S)])
    wx = jnp.asarray(weights["gru_a_wx"], jnp.float32)
    weight_vals = []
    matrix = []
    fused_tables = [
        jnp.asarray(weights[key], jnp.float32)
        @ wx[n * embed_dim:(n + 1) * embed_dim, :]
        for n, key in enumerate(emb_names)
    ]
    if fuse_gather:
        weight_vals += fused_tables
        matrix += [True] * len(fused_tables)
    else:
        # One-hot path: a single stacked [(2S+1)*256, 3ga] table.
        weight_vals.append(jnp.concatenate(fused_tables, axis=0))
        matrix.append(True)

    wh = jnp.asarray(weights["gru_a_wh"], jnp.float32) \
        * jnp.asarray(weights["gru_a_mask"], jnp.float32)
    if sparse_pattern is not None:
        wh = _compact_sparse_wh(wh, sparse_pattern,
                                group_lanes=sparse_group_lanes)
    wx_cond = wx[n_emb * embed_dim:, :]  # only the cond rows ride to VMEM
    for w, m in ((wx_cond, True), (wh, True),
                 (weights["gru_a_bx"], False), (weights["gru_a_bh"], False),
                 (weights["gru_b_wx"], True), (weights["gru_b_wh"], True),
                 (weights["gru_b_bx"], False), (weights["gru_b_bh"], False)):
        weight_vals.append(jnp.asarray(w, jnp.float32))
        matrix.append(m)

    # Heads: per-sub-sample dual FCs fused into one [gb, S*2*256] matrix.
    # ibs carries the inner (pre-tanh) per-channel biases in matching lane
    # order (zeros where a head has none; elided by the static flag).
    ws, gs, bs, ibs = [], [], [], []
    for j in range(S):
        sfx = "" if j == 0 else f"_b{j}"
        ws += [jnp.asarray(weights[f"fc_out1_w{sfx}"], jnp.float32),
               jnp.asarray(weights[f"fc_out2_w{sfx}"], jnp.float32)]
        gs += [jnp.asarray(weights[f"fc_out1_g{sfx}"], jnp.float32),
               jnp.asarray(weights[f"fc_out2_g{sfx}"], jnp.float32)]
        bs.append(jnp.asarray(weights[f"fc_out_b{sfx}"], jnp.float32))
        for n in (1, 2):
            key = _ib_key(j, n)
            ibs.append(jnp.asarray(weights[key], jnp.float32)
                       if key in weights
                       else jnp.zeros(MULAW_LEVELS, jnp.float32))
    weight_vals += [jnp.concatenate(ws, axis=1),
                    jnp.concatenate(gs, axis=-1),
                    jnp.concatenate(ibs, axis=-1),
                    jnp.concatenate(bs, axis=-1)]
    matrix += [True, False, False, False]

    for j in range(1, S):
        ce = jnp.asarray(weights[f"bunch_exc_emb_b{j}"], jnp.float32)
        cp = jnp.asarray(weights[f"bunch_pred_emb_b{j}"], jnp.float32)
        if fuse_gather:
            if corr_rep:
                ce = jnp.repeat(ce, 8, axis=0)
                cp = jnp.repeat(cp, 8, axis=0)
            weight_vals += [ce, cp]
            matrix += [True, True]
        else:
            weight_vals.append(jnp.concatenate([ce, cp], axis=0))
            matrix.append(True)

    for k in range(len(weight_vals)):
        w = weight_vals[k]
        if w.ndim == 1:
            w = w[None, :]
        weight_vals[k] = jnp.asarray(
            w, weight_dtype if matrix[k] else jnp.float32)

    out_shapes = (
        jax.ShapeDtypeStruct((T, frame_size, B), jnp.float32),
        jax.ShapeDtypeStruct((B, gru_a), jnp.float32),
        jax.ShapeDtypeStruct((B, gru_b), jnp.float32),
        jax.ShapeDtypeStruct((B, lpc_order), jnp.float32),
        jax.ShapeDtypeStruct((B, S), jnp.int32),
    )
    out_specs = (
        pl.BlockSpec((1, frame_size, B), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, gru_a), lambda t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, gru_b), lambda t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, lpc_order), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, S), lambda t: (0, 0), memory_space=pltpu.VMEM),
    )
    in_specs = (
        [frame_spec((B, cd)), frame_spec((B, lpc_order)), frame_spec((B, 1)),
         pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [full(w) for w in weight_vals]
        + [full(h_a0), full(h_b0), full(sig_mem0),
           pl.BlockSpec(memory_space=pltpu.VMEM)]
    )

    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((B, gru_a), jnp.float32),
            pltpu.VMEM((B, gru_b), jnp.float32),
            pltpu.VMEM((B, lpc_order), jnp.float32),
            pltpu.VMEM((B, S), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_INTERPRET,
    )(cond, lpc, temp, seeds, *weight_vals, h_a0, h_b0, sig_mem0, exc0)


def sampler_frames_bunched_pallas(model, params, carry, cond_all, lpc_all,
                                  temperature, seeds, frame_size: int = 160,
                                  stochastic: bool = True, weight_dtype=None,
                                  sparse_pattern=None,
                                  sparse_group_lanes=None,
                                  packed_argmax=None,
                                  vpu_corr: bool = True,
                                  fma_pred: bool = False,
                                  vpu_emb: bool = True,
                                  corr_rep: bool = True,
                                  ablate: str = ""):
    """Bunched-model synthesis of T frames.

    carry: (h_a [1,ga], h_b [1,gb], sig_mem [1,16], exc_hist [1,S]).
    Returns ((h_a, h_b, sig_mem, exc_hist), sig [1, T*frame_size]).
    """
    S = model.bunch
    h_a, h_b, sig_mem, exc_hist = carry
    if weight_dtype is None:
        weight_dtype = jnp.bfloat16 if cond_all.shape[0] < 32 else jnp.float32
    if sparse_group_lanes is None:
        ga = h_a.shape[-1]
        sparse_group_lanes = ga if ga % COL_BLOCK == 0 else COL_BLOCK
    if packed_argmax is None:
        # See sampler_frames_pallas: noise washes out the packed form's
        # highest-lane ties and 24-bit quantization; greedy equivalence
        # runs keep the exact min-reduction argmax.
        packed_argmax = bool(stochastic)
    cond = jnp.moveaxis(jnp.asarray(cond_all, jnp.float32), 1, 0)
    lpc = jnp.moveaxis(jnp.asarray(lpc_all, jnp.float32), 1, 0)
    temp = jnp.moveaxis(jnp.asarray(temperature, jnp.float32), 1, 0)
    sig, h_a, h_b, sig_mem, exc = _bunched_sampler_call(
        cond, lpc, temp, jnp.asarray(seeds, jnp.int32), params,
        jnp.asarray(h_a, jnp.float32), jnp.asarray(h_b, jnp.float32),
        jnp.asarray(sig_mem, jnp.float32),
        jnp.asarray(exc_hist, jnp.int32).reshape(-1, S),
        frame_size=frame_size, bunch=S, stochastic=stochastic,
        weight_dtype=weight_dtype, sparse_pattern=sparse_pattern,
        sparse_group_lanes=sparse_group_lanes,
        packed_argmax=bool(packed_argmax),
        vpu_corr=vpu_corr, fma_pred=fma_pred, vpu_emb=vpu_emb,
        corr_rep=corr_rep,
        ablate=frozenset(a for a in ablate.split(",") if a),
    )
    T, F, B = sig.shape
    sig = jnp.moveaxis(sig.reshape(T * F, B), 0, 1)
    return (h_a, h_b, sig_mem, exc), sig
