"""Pallas TPU kernels for the double-float hot loops.

Why kernels and not XLA fusions: the df64 error-free transforms expand
every logical op into ~6-40 IEEE f32 ops, so the barrier/matvec bodies are
thousands-of-ops elementwise chains. XLA inlines those chains into every
call site's fusion, and the TPU backend generates ~100 KB of code per
fusion — the fine-level Newton program reached 310-354 MB of generated
code, which crashed the TPU worker at L=6 and put warm compiles at ~100 s.
A Pallas kernel hides the chain inside ONE Mosaic payload: call sites
become cheap custom-calls, the program shrinks by orders of magnitude, and
the chain runs VMEM-resident instead of materializing every intermediate
through HBM.

Kernel boundaries: gathers (``v[cols]``) and scatter-adds stay in XLA
(dynamic indexed access is where Mosaic is weakest; XLA's gather is fine) —
the kernels take the gathered element panels and produce per-element
contributions. Grid is over element tiles; trailing (p, C, nD) axes ride
along in the block.

Everything here mirrors ``solver/levelops.py`` / ``ops/df64.py`` exactly —
the kernels call the same df64 functions on block values; interpret-mode
tests assert bit-equality of rounding behavior against the XLA path on CPU
(tests/test_pallas.py).

Reference role: these replace the CUDA batched-GEMM + cuDSS hot path of
``/root/reference/ext/MultiGridBarrierCUDAExt`` (bench.md names the batched
structured path as the reference's performance core).
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from . import df64

_MODE = os.environ.get("MGBTPU_PALLAS", "auto")
_TILE = int(os.environ.get("MGBTPU_PALLAS_TILE", 128))


@functools.cache
def enabled():
    """Pallas path on? auto = real TPU only (Mosaic); "interpret" runs the
    kernels through the Pallas interpreter (CPU tests); "0" disables."""
    if _MODE == "0":
        return False
    if _MODE == "interpret":
        return True
    if _MODE == "1":
        return True
    return jax.default_backend() not in ("cpu",)


@functools.cache
def _interpret():
    return _MODE == "interpret" or (
        _MODE == "auto" and jax.default_backend() == "cpu")


def _pl():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl, pltpu


def _pad_n(a, axis, n_pad):
    if n_pad == 0:
        return a
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, n_pad)
    return jnp.pad(a, pad)


def _grid_n(N):
    t = min(_TILE, max(8, N))
    n_tiles = -(-N // t)
    return t, n_tiles, n_tiles * t - N


# ---------------------------------------------------------------------------
# Panel kernels. Layout: the ELEMENT axis rides in lanes (last dim), the
# tiny structural axes (nD, p, C) lead — a (nD, T, p, C) block would pad
# C (~14-30) up to 128 lanes, blowing the VMEM budget ~10x (measured: a
# 33.9 MB scoped-vmem OOM at L=4). In (..., T) layout every vector op is a
# full (C, T) or (T,) tile and the structural axes unroll statically.
# ---------------------------------------------------------------------------

def _dd_sum0(h, l):
    """dd pairwise tree sum over axis 0 of (C, T) -> (T,) (leading-axis
    slices only: no transposes/reshapes inside the kernel)."""
    n = h.shape[0]
    while n > 1:
        m = n // 2
        sh, sl = df64.dd_add((h[:m], l[:m]), (h[m:2 * m], l[m:2 * m]))
        if n % 2:
            h = jnp.concatenate([sh, h[n - 1:n]], axis=0)
            l = jnp.concatenate([sl, l[n - 1:n]], axis=0)
        else:
            h, l = sh, sl
        n = h.shape[0]
    return h[0], l[0]


def _ymv_kernel(panels_ref, yh_ref, yl_ref, sg_ref, ch_ref, cl_ref):
    panels = panels_ref[...]                   # (nD, p, C, T)
    Yh = yh_ref[...]                           # (p, nD, nD, T)
    Yl = yl_ref[...]
    sg = sg_ref[...]                           # (C, T)
    nD, p, C, T = panels.shape
    ch = None
    for q in range(p):
        # forward: Dz[k] at local node q, dd (T,)
        Dz = []
        for k in range(nD):
            ph, pe = df64.two_prod(panels[k, q], sg)
            Dz.append(_dd_sum0(ph, pe))
        # node block: W[i] = sum_j Y[q, i, j] Dz[j], dd (T,)
        for i in range(nD):
            wh, wl = None, None
            for j in range(nD):
                ph, pe = df64.two_prod(Yh[q, i, j], Dz[j][0])
                pe = pe + Yh[q, i, j] * Dz[j][1] + Yl[q, i, j] * Dz[j][0]
                if wh is None:
                    wh, wl = df64.quick_two_sum(ph, pe)
                else:
                    wh, wl = df64.dd_add((wh, wl), (ph, pe))
            # adjoint: contrib += panels[i, q, :, :] * W  (C, T)
            rh, re = df64.two_prod(panels[i, q], wh[None])
            re = re + panels[i, q] * wl[None]
            if ch is None:
                ch, cl = df64.quick_two_sum(rh, re)
            else:
                ch, cl = df64.dd_add((ch, cl), (rh, re))
    ch_ref[...] = ch
    cl_ref[...] = cl


def ymv_contrib(panels_k, Yh, Yl, sg):
    """The gather-to-scatter middle of ``y_matvec_rel``/``y_matvec_dd``:
    per-element forward dd product, node-block dd contraction, adjoint dd
    contraction — one fused kernel (the per-CG-iteration hot op).

    panels_k (nD, p, C, N), Yh/Yl (p, nD, nD, N), sg (C, N) ->
    dd contribution pair, each (C, N)."""
    pl, pltpu = _pl()
    nD, p, C, N = panels_k.shape
    T, n_tiles, n_pad = _grid_n(N)
    panels_k = _pad_n(panels_k, 3, n_pad)
    Yh = _pad_n(Yh, 3, n_pad)
    Yl = _pad_n(Yl, 3, n_pad)
    sg = _pad_n(sg, 1, n_pad)
    dt = sg.dtype
    out = pl.pallas_call(
        _ymv_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((nD, p, C, T), lambda i: (0, 0, 0, i)),
            pl.BlockSpec((p, nD, nD, T), lambda i: (0, 0, 0, i)),
            pl.BlockSpec((p, nD, nD, T), lambda i: (0, 0, 0, i)),
            pl.BlockSpec((C, T), lambda i: (0, i)),
        ],
        out_specs=[pl.BlockSpec((C, T), lambda i: (0, i)),
                   pl.BlockSpec((C, T), lambda i: (0, i))],
        out_shape=[jax.ShapeDtypeStruct((C, n_tiles * T), dt)] * 2,
        interpret=_interpret(),
    )(panels_k, Yh, Yl, sg)
    return out[0][:, :N], out[1][:, :N]


def _fwd_kernel(panels_ref, sg_ref, hi_ref, lo_ref):
    panels = panels_ref[...]                   # (nD, p, C, T)
    sg = sg_ref[...]                           # (C, T)
    nD, p, C, T = panels.shape
    for q in range(p):
        for k in range(nD):
            ph, pe = df64.two_prod(panels[k, q], sg)
            h, l = _dd_sum0(ph, pe)
            hi_ref[q, k] = h
            lo_ref[q, k] = l


def fwd_dd(panels_k, sg):
    """``apply_G_dd`` middle: panels_k (nD, p, C, N), sg (C, N) -> dd node
    values, each (p, nD, N)."""
    pl, pltpu = _pl()
    nD, p, C, N = panels_k.shape
    T, n_tiles, n_pad = _grid_n(N)
    panels_k = _pad_n(panels_k, 3, n_pad)
    sg = _pad_n(sg, 1, n_pad)
    dt = sg.dtype
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((nD, p, C, T), lambda i: (0, 0, 0, i)),
            pl.BlockSpec((C, T), lambda i: (0, i)),
        ],
        out_specs=[pl.BlockSpec((p, nD, T), lambda i: (0, 0, i)),
                   pl.BlockSpec((p, nD, T), lambda i: (0, 0, i))],
        out_shape=[jax.ShapeDtypeStruct((p, nD, n_tiles * T), dt)] * 2,
        interpret=_interpret(),
    )(panels_k, sg)
    return out[0][..., :N], out[1][..., :N]


def _adj_kernel(panels_ref, yh_ref, yl_ref, ch_ref, cl_ref):
    panels = panels_ref[...]                   # (nD, p, C, T)
    Yh = yh_ref[...]                           # (p, nD, T)
    Yl = yl_ref[...]
    nD, p, C, T = panels.shape
    ch = None
    for q in range(p):
        for k in range(nD):
            rh, re = df64.two_prod(panels[k, q], Yh[q, k][None])
            re = re + panels[k, q] * Yl[q, k][None]
            if ch is None:
                ch, cl = df64.quick_two_sum(rh, re)
            else:
                ch, cl = df64.dd_add((ch, cl), (rh, re))
    ch_ref[...] = ch
    cl_ref[...] = cl


def adj_contrib(panels_k, Yh, Yl):
    """``apply_Gt_dd`` middle: panels_k (nD, p, C, N), Y dd (p, nD, N) ->
    dd per-slot contributions, each (C, N)."""
    pl, pltpu = _pl()
    nD, p, C, N = panels_k.shape
    T, n_tiles, n_pad = _grid_n(N)
    panels_k = _pad_n(panels_k, 3, n_pad)
    Yh = _pad_n(Yh, 2, n_pad)
    Yl = _pad_n(Yl, 2, n_pad)
    dt = Yh.dtype
    out = pl.pallas_call(
        _adj_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((nD, p, C, T), lambda i: (0, 0, 0, i)),
            pl.BlockSpec((p, nD, T), lambda i: (0, 0, i)),
            pl.BlockSpec((p, nD, T), lambda i: (0, 0, i)),
        ],
        out_specs=[pl.BlockSpec((C, T), lambda i: (0, i)),
                   pl.BlockSpec((C, T), lambda i: (0, i))],
        out_shape=[jax.ShapeDtypeStruct((C, n_tiles * T), dt)] * 2,
        interpret=_interpret(),
    )(panels_k, Yh, Yl)
    return out[0][:, :N], out[1][:, :N]


# ---------------------------------------------------------------------------
# generic per-node barrier evaluation (the vmap(F) chains)
# ---------------------------------------------------------------------------

def node_eval(F, args, Dz_pair, n_out=None):
    """Run ``jax.vmap(F)(*args, DD(Dzh, Dzl))`` inside one Pallas kernel.

    ``args``: tuple of arrays with leading node axis m (barrier parameters);
    ``Dz_pair``: (hi, lo) each (m, nD). ``F`` returns a DD pytree; the
    wrapper flattens it to ``n_out`` leaf pairs. Grid tiles the node axis.
    Returns the re-assembled output pytree (of DD leaves).
    """
    from .ddarray import DD

    pl, pltpu = _pl()
    Dzh, Dzl = Dz_pair
    m = Dzh.shape[0]
    T, n_tiles, n_pad = _grid_n(m)
    flat_in = [_pad_n(jnp.asarray(a), 0, n_pad) for a in args] + \
        [_pad_n(Dzh, 0, n_pad), _pad_n(Dzl, 0, n_pad)]
    # Mosaic prefers >=2D blocks: ride 1D arrays as (m, 1)
    in_1d = [a.ndim == 1 for a in flat_in]
    flat_in = [a[:, None] if one else a for a, one in zip(flat_in, in_1d)]

    # probe output structure (tree + which leaves were DD) via eval_shape's
    # trace; the cell capture is a static side effect of tracing
    cell = {}

    def batched(*ins):
        ins = [x[:, 0] if one else x for x, one in zip(ins, in_1d)]
        a, dh, dl = ins[:-2], ins[-2], ins[-1]
        out = jax.vmap(F)(*a, DD(dh, dl))
        leaves, tree = jax.tree_util.tree_flatten(
            out, is_leaf=lambda x: isinstance(x, DD))
        cell["tree"] = tree
        cell["is_dd"] = [isinstance(lf, DD) for lf in leaves]
        pairs = []
        for lf in leaves:
            if isinstance(lf, DD):
                pairs += [lf.hi, lf.lo]
            else:
                pairs += [lf, jnp.zeros_like(lf)]
        # ride 1D outputs as (m, 1) for the same Mosaic reason
        cell["out_1d"] = [v.ndim == 1 for v in pairs]
        return [v[:, None] if v.ndim == 1 else v for v in pairs]

    # hoist ALL closure constants (barrier Fs capture small index/mask
    # tables; Pallas kernels may not capture constants, and
    # jax.closure_convert only hoists inexact-dtype ones). Trace at TILE
    # shapes: the jaxpr runs on per-tile blocks inside the kernel, and any
    # shape-derived static (tree-sum splits, reshapes) must match the tile.
    tile_in = [jax.ShapeDtypeStruct((T,) + a.shape[1:], a.dtype)
               for a in flat_in]
    closed = jax.make_jaxpr(batched)(*tile_in)
    consts = list(closed.consts)

    def batched_cc(*args_and_consts):
        from jax._src.core import eval_jaxpr

        a = args_and_consts[:len(flat_in)]
        cs = args_and_consts[len(flat_in):]
        return eval_jaxpr(closed.jaxpr, cs, *a)

    tile_shapes = jax.eval_shape(batched, *tile_in)
    shapes = [jax.ShapeDtypeStruct((n_tiles * T,) + s.shape[1:], s.dtype)
              for s in tile_shapes]
    if n_out is None:
        n_out = len(shapes) // 2
    assert len(shapes) == 2 * n_out, (len(shapes), n_out)
    const_in = []
    const_bool = []
    for c in consts:
        c = jnp.asarray(c)
        const_bool.append(c.dtype == jnp.bool_)
        if const_bool[-1]:
            c = c.astype(jnp.int8)
        const_in.append(c.reshape((1,) * max(0, 2 - c.ndim) + c.shape))

    def kernel(*refs):
        ins = [r[...] for r in refs[:len(flat_in)]]
        cs = []
        for r, c, was_b in zip(refs[len(flat_in):len(flat_in) + len(consts)],
                               consts, const_bool):
            v = r[...].reshape(jnp.shape(c))
            cs.append(v.astype(jnp.bool_) if was_b else v)
        outs = refs[len(flat_in) + len(consts):]
        for o, v in zip(outs, batched_cc(*ins, *cs)):
            o[...] = v

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec((T,) + tuple(shape[1:]),
                            lambda i, _nd=nd: (i,) + (0,) * (_nd - 1))

    def cspec(shape):
        nd = len(shape)
        return pl.BlockSpec(tuple(shape),
                            lambda i, _nd=nd: (0,) * _nd)

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[spec(a.shape) for a in flat_in] +
                 [cspec(c.shape) for c in const_in],
        out_specs=[spec(s.shape) for s in shapes],
        out_shape=[jax.ShapeDtypeStruct(s.shape, s.dtype) for s in shapes],
        interpret=_interpret(),
    )(*flat_in, *const_in)
    out = [o[:m, 0] if one else o[:m]
           for o, one in zip(out, cell["out_1d"])]
    leaves = [DD(out[2 * i], out[2 * i + 1]) if cell["is_dd"][i]
              else out[2 * i] for i in range(n_out)]
    return jax.tree_util.tree_unflatten(cell["tree"], leaves)


# ---------------------------------------------------------------------------
# dd panel Cholesky + triangular inverse, one kernel. The XLA form
# (ddlinalg._dd_cholesky_rolled + dd_tri_inverse) is ~60 primitive HLOs per
# column on the program's critical path — the measured latency bill of the
# ND factorization at the small-batch top tree levels (fori_loop iterations
# execute serially and every tiny VPU op pays dispatch overhead). Here the
# whole w-column factor + substitution-form inverse unrolls STATICALLY
# inside one Mosaic payload: straight-line VPU code on (w, w, T) tiles with
# the batch axis riding in lanes, no dynamic slicing, leading-axis tree
# sums only (no in-kernel transposes).
# ---------------------------------------------------------------------------

# panel width: follows ddlinalg._BLOCK (MGBTPU_DD_BLOCK) so the fused
# kernel and the blocked factorization agree; wrapper pads smaller n
_PANEL_W = int(os.environ.get("MGBTPU_DD_BLOCK", 32))


def _chol_inv_kernel(ah_ref, al_ref, ih_ref, il_ref):
    Ah = ah_ref[...]                    # (w, w, T) dd hi
    Al = al_ref[...]
    w, _, T = Ah.shape
    # --- dd Cholesky, static shrinking trailing blocks ---
    cols = []                           # column j: dd (w - j, T), diag first
    Th, Tl = Ah, Al
    for j in range(w):
        sh, sl = df64.dd_sqrt((Th[0, 0], Tl[0, 0]))
        rih, ril = df64.dd_recip((sh, sl))
        if j < w - 1:
            ch, cl = df64.dd_mul((Th[1:, 0], Tl[1:, 0]),
                                 (rih[None], ril[None]))
            oh, ol = df64.dd_mul((ch[:, None], cl[:, None]),
                                 (ch[None, :], cl[None, :]))
            Th, Tl = df64.dd_sub((Th[1:, 1:], Tl[1:, 1:]), (oh, ol))
            cols.append((jnp.concatenate([sh[None], ch], 0),
                         jnp.concatenate([sl[None], cl], 0)))
        else:
            cols.append((sh[None], sl[None]))
    # L in (row, col, T) form, zeros above the diagonal. j == 0 keeps the
    # bare column: a (0, T) zeros operand fails Mosaic lowering ("vector
    # types must have positive constant sizes").
    def _col(j, part):
        if j == 0:
            return cols[0][part]
        return jnp.concatenate(
            [jnp.zeros((j, T), Ah.dtype), cols[j][part]], 0)

    Lh = jnp.stack([_col(j, 0) for j in range(w)], 1)
    Ll = jnp.stack([_col(j, 1) for j in range(w)], 1)
    # --- X = L^-1 by dd forward substitution, row by row (static).
    # No .at[].set anywhere: Mosaic has no scatter lowering — slot writes
    # go through a static row-index mask instead. ---
    row_id = jax.lax.broadcasted_iota(jnp.int32, (w, T), 0)
    rows = []                           # row j of X: dd (w, T)
    for j in range(w):
        dh, dl = df64.dd_recip((Lh[j, j], Ll[j, j]))
        if j == 0:
            sel = (row_id == 0)
            rh = jnp.where(sel, dh[None], 0.0)
            rl = jnp.where(sel, dl[None], 0.0)
        else:
            Xh = jnp.stack([r[0] for r in rows], 0)     # (j, w, T)
            Xl = jnp.stack([r[1] for r in rows], 0)
            ph, pe = df64.dd_mul((Lh[j, :j][:, None, :],
                                  Ll[j, :j][:, None, :]), (Xh, Xl))
            sh_, sl_ = _dd_sum0(ph, pe)                 # (w, T)
            nh, nl = df64.dd_neg((sh_, sl_))
            # unit rhs at slot j enters only the diagonal term: row =
            # (e_j - s) / L[j, j], and s[j] = 0 (X strictly lower there)
            rh, rl = df64.dd_mul((nh, nl), (dh[None], dl[None]))
            sel = (row_id == j)
            rh = jnp.where(sel, dh[None], rh)
            rl = jnp.where(sel, dl[None], rl)
        rows.append((rh, rl))
    ih_ref[...] = jnp.stack([r[0] for r in rows], 0)
    il_ref[...] = jnp.stack([r[1] for r in rows], 0)


def panel_chol_inv(Ah, Al):
    """Batched dd SPD panel (B, n, n) -> dd inverse Cholesky factor
    L^-1 (lower triangular), n <= _PANEL_W. One fused kernel; identity
    padding on both the size and batch axes (pads invert to themselves).

    The kernel width adapts to n (next power of two, min 8 — the f32
    sublane tile): the in-kernel factor + substitution chain is O(w)
    serial, and the tiny upper-tree ND fronts (n = 3..15) would otherwise
    pay the full 32-column chain for a 3-column factorization."""
    pl, pltpu = _pl()
    B, n, _ = Ah.shape
    w = min(_PANEL_W, max(8, 1 << (n - 1).bit_length()))
    dt = Ah.dtype
    if n < w:
        pad = w - n
        Ah = jnp.pad(Ah, ((0, 0), (0, pad), (0, pad)))
        Al = jnp.pad(Al, ((0, 0), (0, pad), (0, pad)))
        tail = jnp.arange(n, w)
        Ah = Ah.at[:, tail, tail].set(1.0)
    T = min(_TILE, max(8, B))
    n_tiles = -(-B // T)
    Bp = n_tiles * T
    At_h = jnp.transpose(Ah, (1, 2, 0))          # (w, w, B)
    At_l = jnp.transpose(Al, (1, 2, 0))
    if Bp != B:
        At_h = jnp.pad(At_h, ((0, 0), (0, 0), (0, Bp - B)))
        At_l = jnp.pad(At_l, ((0, 0), (0, 0), (0, Bp - B)))
        ii = jnp.arange(w)
        At_h = At_h.at[ii, ii, B:].set(1.0)
    out = pl.pallas_call(
        _chol_inv_kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((w, w, T), lambda i: (0, 0, i)),
                  pl.BlockSpec((w, w, T), lambda i: (0, 0, i))],
        out_specs=[pl.BlockSpec((w, w, T), lambda i: (0, 0, i)),
                   pl.BlockSpec((w, w, T), lambda i: (0, 0, i))],
        out_shape=[jax.ShapeDtypeStruct((w, w, Bp), dt)] * 2,
        interpret=_interpret(),
    )(At_h, At_l)
    ih = jnp.transpose(out[0][:, :, :B], (2, 0, 1))[:, :n, :n]
    il = jnp.transpose(out[1][:, :, :B], (2, 0, 1))[:, :n, :n]
    return ih, il
