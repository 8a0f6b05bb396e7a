"""Pallas TPU kernel for the 3-plane affine DP fill.

Fuses the whole anti-diagonal sweep of align/batch.py into a single Mosaic
kernel: the score carries live in VMEM scratch across grid steps (one grid
step = one anti-diagonal of one batch tile), and the per-diagonal read
bytes come from a pure-roll window - the systolic-array formulation of
sequence alignment, with the VPU's 8x128 lanes playing the array:

    w[x] <- read[d-1-x]   (window rolls one lane per diagonal)
    rx fixed per lane     (ref byte per DP row)

The read is preloaded REVERSED at the top lanes of a W-wide buffer
(rev[W-1-k] = read[k]); after d cumulative one-lane rolls,
roll(rev, d)[x] = rev[(x-d) mod W] = read[d-1-x] for every in-band cell,
so the per-step update is a single pltpu.roll with no dynamic lane index
(Mosaic rejects non-128-aligned dynamic slices on the lane dimension).

Per grid step the kernel computes the three planes' [TILE_B, n1] updates
(exactly update_3d_score's max/tie semantics, vectorized) and writes one
packed traceback byte per cell. Semantics match align/batch.py bit for bit;
tests run the kernel in interpreter mode on CPU against the golden model,
and align_batch_device can route through it on TPU with
CLIQUE_TPU_PALLAS=1.

Full-band fill only (the driver path uses bandwidth >= read length in
practice); the banded/stale-cell variant stays with the XLA kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clique_tpu.align.scoring import MAX_NEG_SCORE

DIAG, UP, LEFT = 0, 1, 2
_TB_FRESH = UP | (UP << 2) | (UP << 4)
TILE_B = 8


def _three_way(up, left, diag):
    up_wins = (up > left) & (up > diag)
    left_wins = jnp.logical_not(up > left) & (left > diag)
    val = jnp.where(up_wins, up, jnp.where(left_wins, left, diag))
    direction = jnp.where(up_wins, UP,
                          jnp.where(left_wins, LEFT, DIAG)).astype(jnp.uint8)
    return val, direction


def _fill_kernel(params_ref,                     # SMEM [6] f32
                 lens_ref,                       # VMEM [TILE_B, 128] i32
                 refs_ref, rev_reads_ref,        # VMEM [TILE_B, n1], [TILE_B, W]
                 tb_ref, corner_ref,             # outputs
                 pm, pp1, pp2, p2m, p2p1, p2p2,  # scratch [TILE_B, n1] f32
                 win,                            # scratch [TILE_B, W] i32
                 corner_acc,                     # scratch [TILE_B, 128] f32
                 *, special_mode: str):
    d = pl.program_id(1)
    n1 = pm.shape[1]
    neg = jnp.float32(MAX_NEG_SCORE)

    m_s = params_ref[0]
    mm_s = params_ref[1]
    sp_s = params_ref[2]
    go = params_ref[3]
    ge = params_ref[4]
    fgm = params_ref[5]

    @pl.when(d == 0)
    def _init():
        pm[...] = jnp.zeros_like(pm)
        pp1[...] = jnp.zeros_like(pp1)
        pp2[...] = jnp.zeros_like(pp2)
        p2m[...] = jnp.zeros_like(p2m)
        p2p1[...] = jnp.zeros_like(p2p1)
        p2p2[...] = jnp.zeros_like(p2p2)
        win[...] = rev_reads_ref[...].astype(jnp.int32)
        corner_acc[...] = jnp.zeros_like(corner_acc)

    # pure-roll systolic read window: rev_reads is laid out so that after d
    # cumulative one-lane rolls, win[:, x] == read[d - 1 - x]; no dynamic
    # indexing (Mosaic requires static lane offsets)
    @pl.when(d > 0)
    def _roll():
        win[...] = pltpu.roll(win[...], 1, 1)

    w = win[:, :n1]
    lane = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)

    x = lane                                    # [TILE_B, n1]
    y = d - x
    # per-element lengths: lens holds l1 at lane 0, l2 at lane 1; one-hot
    # lane reductions pull them out as [TILE_B, 1] columns (no dynamic or
    # scalar indexing inside the kernel)
    lens_v = lens_ref[...]
    lane128 = jax.lax.broadcasted_iota(jnp.int32, lens_v.shape, 1)
    l1 = jnp.sum(jnp.where(lane128 == 0, lens_v, 0), axis=1, keepdims=True)
    l2 = jnp.sum(jnp.where(lane128 == 1, lens_v, 0), axis=1, keepdims=True)

    rx = refs_ref[...].astype(jnp.int32)        # ref byte at x-1, pre-shifted
    ry = w
    if special_mode == "ref_n_only":
        # rust-bio-compat rule (alignment_functions.rs:55): only a
        # reference-side N scores as a guaranteed match
        special = rx == 78
    else:
        special = (rx == 78) | (ry == 78) | (rx < 58) | (ry < 58)
    ms = jnp.where(special, sp_s, jnp.where(rx == ry, m_s, mm_s))

    gm = jnp.where((x == l1) | (y == l2), fgm, jnp.float32(1.0))
    x1 = go + ge * gm
    lge = ge * gm

    def shift(v):
        r = pltpu.roll(v, 1, 1)
        return jnp.where(lane == 0, jnp.float32(0.0), r)

    p2m_s = shift(p2m[...])
    p2p1_s = shift(p2p1[...])
    p2p2_s = shift(p2p2[...])
    pm_v = pm[...]
    pp1_v = pp1[...]
    pp2_v = pp2[...]
    pm_s = shift(pm_v)
    pp1_s = shift(pp1_v)
    pp2_s = shift(pp2_v)

    m_val, m_dir = _three_way(p2p1_s + ms, p2p2_s + ms, p2m_s + ms)
    d_val, d_dir = _three_way(pp1_s + lge, pp2_s + x1, pm_s + x1)
    i_val, i_dir = _three_way(pp1_v + x1, pp2_v + lge, pm_v + x1)

    interior = (x >= 1) & (x <= l1) & (y >= 1) & (y <= l2)
    is_x_border = (x == 0) & (y >= 1) & (y <= l2)
    is_y_border = (y == 0) & (x >= 1) & (x <= l1)
    is_origin = (x == 0) & (y == 0)

    xb = (go + y.astype(jnp.float32) * ge) * fgm
    yb = (go + x.astype(jnp.float32) * ge) * fgm

    m_out = jnp.where(interior, m_val,
                      jnp.where(is_origin, 0.0,
                                jnp.where(is_x_border | is_y_border, neg,
                                          0.0))).astype(jnp.float32)
    p1_out = jnp.where(interior, d_val,
                       jnp.where(is_x_border, xb,
                                 jnp.where(is_y_border, yb,
                                           jnp.where(is_origin, neg, 0.0)))
                       ).astype(jnp.float32)
    p2_out = jnp.where(interior, i_val,
                       jnp.where(is_x_border, xb,
                                 jnp.where(is_y_border, yb,
                                           jnp.where(is_origin, neg, 0.0)))
                       ).astype(jnp.float32)

    tb = jnp.where(
        interior,
        m_dir.astype(jnp.int32) | (d_dir.astype(jnp.int32) << 2)
        | (i_dir.astype(jnp.int32) << 4),
        _TB_FRESH).astype(jnp.int32)
    # pack 4 diagonals per int32 word; blocks hold 8 words (32 diagonals)
    # to satisfy Mosaic's (8, 128) block-shape divisibility
    word = (tb << (8 * (d % 4)))[:, None, :]
    word_row = (d % 32) // 4

    @pl.when(d % 32 == 0)
    def _new_block():
        tb_ref[...] = jnp.zeros_like(tb_ref)

    cur = tb_ref[:, pl.ds(word_row, 1), :]
    tb_ref[:, pl.ds(word_row, 1), :] = cur | word

    # capture corner scores when each row's own corner diagonal passes
    # (per-element lengths: rows hit their corner on different diagonals)
    on_corner = (d == l1 + l2)                   # [TILE_B, 1]
    corner_col = jnp.where(x == l1, m_out, 0.0)
    corner_m = jnp.sum(corner_col, axis=1, keepdims=True)
    corner_p1 = jnp.sum(jnp.where(x == l1, p1_out, 0.0), axis=1,
                        keepdims=True)
    corner_p2 = jnp.sum(jnp.where(x == l1, p2_out, 0.0), axis=1,
                        keepdims=True)
    acc = corner_acc[...]
    lane_acc = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
    packed = jnp.where(lane_acc == 0, corner_m,
                       jnp.where(lane_acc == 1, corner_p1,
                                 jnp.where(lane_acc == 2, corner_p2, 0.0)))
    corner_acc[...] = jnp.where(on_corner, packed, acc)
    corner_ref[...] = corner_acc[...][:, None, :]

    # rotate carries
    p2m[...] = pm_v
    p2p1[...] = pp1_v
    p2p2[...] = pp2_v
    pm[...] = m_out
    pp1[...] = p1_out
    pp2[...] = p2_out


def _vmem_bytes(tile: int, n1: int, n2pad: int) -> int:
    """Rough VMEM footprint of one grid step at a given batch-tile size."""
    W = -(-(n1 + n2pad) // 128) * 128
    scratch = 6 * tile * n1 * 4 + tile * W * 4 + tile * 128 * 4
    blocks = tile * n1 * 4 + tile * W * 4 + tile * 8 * n1 * 4 + tile * 128 * 4
    return scratch + blocks


@functools.partial(jax.jit,
                   static_argnames=("n1", "n2", "special_mode", "packed",
                                    "interpret"))
def pallas_fill(refs, reads, ref_lens, read_lens, scoring_params,
                *, n1: int, n2: int, special_mode: str = "both",
                packed: bool = False, interpret: bool = False):
    """Fill via the Pallas kernel (per-element lengths, full band, global).

    refs [B, n1] uint8 pre-shifted so refs[:, x] = ref byte for DP row x
    (i.e. ref[x-1], column 0 arbitrary); reads [B, n2pad] uint8;
    ref_lens/read_lens [B] i32 (or python ints, broadcast).
    Returns (tb [B, D, n1] uint8-compatible i32, corner [B, 3] f32), or with
    packed=True the raw 4-diagonals-per-int32 words ([B, Dp, n1] i32, word
    w = diagonals 4w..4w+3 at shift 8*(d%4)) for walk paths that consume
    the packed layout directly (unpack_words recovers the uint8 view).
    """
    B = refs.shape[0]
    # Mosaic executes the grid sequentially, so small batch tiles serialize:
    # grow the tile toward the whole diagonal's batch work per grid step
    # (like the XLA scan), VMEM permitting. 8-row tiles measured ~1.5x
    # slower end-to-end than the XLA scan at production shapes. Tiles up to
    # 32 are compile-proven and bit-exact on real TPUs
    # (tools/check_pallas_tpu.py); 64/128-row compiles have timed out
    # through the remote-compile relay, so the default ceiling stays at the
    # proven value and is tunable via CLIQUE_TPU_PALLAS_TILE.
    import os

    max_tile = int(os.environ.get("CLIQUE_TPU_PALLAS_TILE", "32"))
    tile = TILE_B
    while tile < max_tile and tile * 2 <= B and B % (tile * 2) == 0 and \
            _vmem_bytes(tile * 2, n1, reads.shape[1]) < 12 * 2**20:
        tile *= 2
    assert B % tile == 0
    D = n1 + n2 - 1
    Dp = -(-D // 32) * 8           # packed words, padded to 8-word blocks
    n2pad = reads.shape[1]
    # roll-window buffer: reversed read at the top lanes, zeros below; wide
    # enough that lanes x >= d (pre-read region) never touch read bytes
    W = -(-(n1 + n2pad) // 128) * 128
    rev_reads = jnp.pad(reads[:, ::-1], ((0, 0), (W - n2pad, 0)))

    params = scoring_params.astype(jnp.float32)
    ref_lens = jnp.broadcast_to(jnp.asarray(ref_lens, jnp.int32), (B,))
    read_lens = jnp.broadcast_to(jnp.asarray(read_lens, jnp.int32), (B,))
    lens = (jnp.zeros((B, 128), jnp.int32)
            .at[:, 0].set(ref_lens).at[:, 1].set(read_lens))

    grid = (B // tile, D)
    out_tb, out_corner = pl.pallas_call(
        functools.partial(_fill_kernel, special_mode=special_mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, 128), lambda i, d: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n1), lambda i, d: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, W), lambda i, d: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, 8, n1), lambda i, d: (i, d // 32, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1, 128), lambda i, d: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Dp, n1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, n1), jnp.float32) for _ in range(6)
        ] + [
            pltpu.VMEM((tile, W), jnp.int32),
            pltpu.VMEM((tile, 128), jnp.float32),
        ],
        interpret=interpret,
    )(params, lens, refs.astype(jnp.int32), rev_reads)
    corner = out_corner[:, 0, :3]
    if packed:
        return out_tb, corner
    return unpack_words(out_tb, D), corner


def unpack_words(words, D: int):
    """[B, Dp, n1] i32 packed words -> [B, D, n1] uint8 traceback bytes."""
    B, Dp, n1 = words.shape
    shifts = jnp.array([0, 8, 16, 24], dtype=jnp.int32)
    unpacked = ((words[:, :, None, :] >> shifts[None, None, :, None])
                & 0xFF).astype(jnp.uint8)
    return unpacked.reshape(B, 4 * Dp, n1)[:, :D]
