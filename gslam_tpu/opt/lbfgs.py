"""L-BFGS with strong-Wolfe line search, entirely inside jit.

The reference optimizes camera poses with torch.optim.LBFGS
(strong_wolfe; /root/reference/gslam/frontend.py:604-662 and
backend.py:447-506), whose closure re-renders the scene on every function
evaluation. On TPU the whole optimizer must live device-side: Python-level
loops would serialize host-device round-trips between evaluations. This
implementation runs the iteration loop, two-loop recursion, and the
bracket+zoom line search as lax.while_loops over fixed-shape carries, so an
entire multi-evaluation pose refinement is ONE XLA program.

Algorithmic structure follows the standard strong-Wolfe cubic-interpolation
line search (Nocedal & Wright §3.5) with torch-compatible defaults
(c1=1e-4, c2=0.9, history=5-10, bounded evaluation budget).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LbfgsResult(NamedTuple):
    x: jax.Array
    f: jax.Array
    g: jax.Array
    n_evals: jax.Array
    n_iters: jax.Array


def _cubic_min(x1, f1, g1, x2, f2, g2, lo, hi):
    """Minimizer of the cubic interpolant of (x1,f1,g1),(x2,f2,g2) in [lo,hi]."""
    d1 = g1 + g2 - 3 * (f1 - f2) / (x1 - x2)
    d2_sq = d1 * d1 - g1 * g2
    ok = d2_sq >= 0
    d2 = jnp.sqrt(jnp.where(ok, d2_sq, 0.0)) * jnp.sign(x2 - x1)
    t = x2 - (x2 - x1) * ((g2 + d2 - d1) / (g2 - g1 + 2 * d2))
    t = jnp.where(ok & jnp.isfinite(t), t, 0.5 * (lo + hi))
    return jnp.clip(t, lo, hi)


class _WolfeCarry(NamedTuple):
    t_lo: jax.Array
    f_lo: jax.Array
    d_lo: jax.Array  # directional derivative at t_lo
    g_lo: jax.Array
    t_hi: jax.Array
    f_hi: jax.Array
    d_hi: jax.Array
    g_hi: jax.Array
    t: jax.Array
    f: jax.Array
    dd: jax.Array
    g: jax.Array
    t_prev: jax.Array
    f_prev: jax.Array
    d_prev: jax.Array
    g_prev: jax.Array
    n_evals: jax.Array
    stage: jax.Array  # 0 = bracketing, 1 = zoom, 2 = done
    insuf: jax.Array  # insufficient-progress flag in zoom


def _strong_wolfe(
    fg: Callable, x: jax.Array, d: jax.Array, t0, f0, g0,
    c1: float = 1e-4, c2: float = 0.9, max_ls: int = 25,
    tol_change: float = 1e-9,
):
    """Find t satisfying strong Wolfe along d from x. Returns (f, g, t, evals)."""
    dd0 = jnp.dot(g0, d)

    def eval_at(t):
        f, g = fg(x + t * d)
        return f, g, jnp.dot(g, d)

    f1, g1, dd1 = eval_at(t0)
    zero = jnp.zeros_like(t0)

    init = _WolfeCarry(
        t_lo=zero, f_lo=f0, d_lo=dd0, g_lo=g0,
        t_hi=t0, f_hi=f1, d_hi=dd1, g_hi=g1,
        t=t0, f=f1, dd=dd1, g=g1,
        t_prev=zero, f_prev=f0, d_prev=dd0, g_prev=g0,
        n_evals=jnp.array(1, jnp.int32),
        stage=jnp.array(0, jnp.int32),
        insuf=jnp.array(False),
    )

    def cond(c: _WolfeCarry):
        return (c.stage < 2) & (c.n_evals < max_ls)

    def bracket_step(c: _WolfeCarry) -> _WolfeCarry:
        armijo_fail = (c.f > f0 + c1 * c.t * dd0) | (
            (c.n_evals > 1) & (c.f >= c.f_prev)
        )
        wolfe_ok = jnp.abs(c.dd) <= -c2 * dd0
        ascent = c.dd >= 0

        # case 1: bracket found [prev, cur]
        def to_zoom_prev_cur(c):
            return c._replace(
                t_lo=c.t_prev, f_lo=c.f_prev, d_lo=c.d_prev, g_lo=c.g_prev,
                t_hi=c.t, f_hi=c.f, d_hi=c.dd, g_hi=c.g,
                stage=jnp.array(1, jnp.int32),
            )

        # case 2: done
        def done(c):
            return c._replace(
                t_lo=c.t, f_lo=c.f, d_lo=c.dd, g_lo=c.g,
                stage=jnp.array(2, jnp.int32),
            )

        # case 3: derivative >= 0 -> bracket [cur, prev]
        def to_zoom_cur_prev(c):
            return c._replace(
                t_lo=c.t, f_lo=c.f, d_lo=c.dd, g_lo=c.g,
                t_hi=c.t_prev, f_hi=c.f_prev, d_hi=c.d_prev, g_hi=c.g_prev,
                stage=jnp.array(1, jnp.int32),
            )

        # case 4: extrapolate beyond t
        def extrapolate(c):
            min_step = c.t + 0.01 * (c.t - c.t_prev)
            max_step = c.t * 10.0
            t_new = _cubic_min(
                c.t_prev, c.f_prev, c.d_prev, c.t, c.f, c.dd, min_step, max_step
            )
            f_new, g_new, dd_new = eval_at(t_new)
            return c._replace(
                t_prev=c.t, f_prev=c.f, d_prev=c.dd, g_prev=c.g,
                t=t_new, f=f_new, dd=dd_new, g=g_new,
                n_evals=c.n_evals + 1,
            )

        branch = jnp.where(
            armijo_fail, 0, jnp.where(wolfe_ok, 1, jnp.where(ascent, 2, 3))
        )
        return jax.lax.switch(
            branch, [to_zoom_prev_cur, done, to_zoom_cur_prev, extrapolate], c
        )

    def zoom_step(c: _WolfeCarry) -> _WolfeCarry:
        lo_first = c.t_lo <= c.t_hi
        lo_t = jnp.minimum(c.t_lo, c.t_hi)
        hi_t = jnp.maximum(c.t_lo, c.t_hi)
        gap = hi_t - lo_t
        t_new = _cubic_min(
            c.t_lo, c.f_lo, c.d_lo, c.t_hi, c.f_hi, c.d_hi, lo_t, hi_t
        )
        # torch-style progress safeguard: if the interpolation lands within
        # 10% of a boundary twice in a row, bisect.
        eps = 0.1 * gap
        close = (jnp.minimum(hi_t - t_new, t_new - lo_t) < eps)
        t_new = jnp.where(
            close & (c.insuf | (t_new >= hi_t) | (t_new <= lo_t)),
            jnp.where(t_new > 0.5 * (lo_t + hi_t), hi_t - eps, lo_t + eps),
            t_new,
        )
        insuf_new = close
        del lo_first

        f_new, g_new, dd_new = eval_at(t_new)
        armijo_fail = (f_new > f0 + c1 * t_new * dd0) | (f_new >= c.f_lo)

        def shrink_hi(c):
            return c._replace(
                t_hi=t_new, f_hi=f_new, d_hi=dd_new, g_hi=g_new,
            )

        def move_lo(c):
            wolfe_ok = jnp.abs(dd_new) <= -c2 * dd0
            crossed = dd_new * (c.t_hi - c.t_lo) >= 0

            c = jax.lax.cond(
                crossed & ~wolfe_ok,
                lambda c: c._replace(
                    t_hi=c.t_lo, f_hi=c.f_lo, d_hi=c.d_lo, g_hi=c.g_lo
                ),
                lambda c: c,
                c,
            )
            c = c._replace(
                t_lo=t_new, f_lo=f_new, d_lo=dd_new, g_lo=g_new,
                stage=jnp.where(wolfe_ok, 2, c.stage).astype(jnp.int32),
            )
            return c

        c = jax.lax.cond(armijo_fail, shrink_hi, move_lo, c)
        done_small = gap * jnp.abs(dd0) < tol_change
        return c._replace(
            n_evals=c.n_evals + 1,
            insuf=insuf_new,
            stage=jnp.where(done_small, 2, c.stage).astype(jnp.int32),
        )

    def body(c):
        return jax.lax.cond(c.stage == 0, bracket_step, zoom_step, c)

    out = jax.lax.while_loop(cond, body, init)
    return out.f_lo, out.g_lo, out.t_lo, out.n_evals


class _LbfgsCarry(NamedTuple):
    x: jax.Array
    f: jax.Array
    g: jax.Array
    S: jax.Array  # [H, D] parameter differences
    Y: jax.Array  # [H, D] gradient differences
    rho: jax.Array  # [H]
    hist: jax.Array  # int32 number of valid history pairs
    n_evals: jax.Array
    it: jax.Array
    done: jax.Array


# NOT @jit: called from inside jitted programs (pose_refinement_lbfgs,
# warp_track); a nested jit boundary pessimizes axon compilation (see
# docs/PERF.md). Jitted alias `lbfgs` below for eager callers.
def lbfgs_impl(
    loss_fn: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    max_iter: int = 20,
    max_eval: int = 25,
    history: int = 5,
    lr: float = 1.0,
    tol_grad: float = 1e-7,
    tol_change: float = 1e-9,
) -> LbfgsResult:
    """Minimize loss_fn from x0 (flat [D] vector)."""
    dim = x0.shape[0]
    fg = jax.value_and_grad(loss_fn)

    f0, g0 = fg(x0)
    init = _LbfgsCarry(
        x=x0, f=f0, g=g0,
        S=jnp.zeros((history, dim)), Y=jnp.zeros((history, dim)),
        rho=jnp.zeros((history,)),
        hist=jnp.array(0, jnp.int32),
        n_evals=jnp.array(1, jnp.int32),
        it=jnp.array(0, jnp.int32),
        done=jnp.max(jnp.abs(g0)) <= tol_grad,
    )

    def direction(c: _LbfgsCarry) -> jax.Array:
        # two-loop recursion; history stored ring-free (index hist-1 newest).
        def first(_):
            return -c.g

        def recur(_):
            q = -c.g

            def bwd(i, carry):
                q, alpha = carry
                idx = c.hist - 1 - i
                valid = idx >= 0
                s, y, r = c.S[idx], c.Y[idx], c.rho[idx]
                a = r * jnp.dot(s, q)
                q = jnp.where(valid, q - a * y, q)
                alpha = alpha.at[idx].set(jnp.where(valid, a, 0.0))
                return q, alpha

            q, alpha = jax.lax.fori_loop(
                0, history, bwd, (q, jnp.zeros((history,)))
            )
            newest = c.hist - 1
            gamma = jnp.dot(c.S[newest], c.Y[newest]) / jnp.maximum(
                jnp.dot(c.Y[newest], c.Y[newest]), 1e-10
            )
            q = q * gamma

            def fwd(i, q):
                valid = i < c.hist
                s, y, r = c.S[i], c.Y[i], c.rho[i]
                b = r * jnp.dot(y, q)
                return jnp.where(valid, q + (alpha[i] - b) * s, q)

            return jax.lax.fori_loop(0, history, fwd, q)

        return jax.lax.cond(c.hist == 0, first, recur, None)

    def cond_fn(c: _LbfgsCarry):
        return (~c.done) & (c.it < max_iter) & (c.n_evals < max_eval)

    def body(c: _LbfgsCarry) -> _LbfgsCarry:
        d = direction(c)
        dd = jnp.dot(c.g, d)

        t_init = jnp.where(
            c.it == 0,
            jnp.minimum(1.0, 1.0 / jnp.maximum(jnp.sum(jnp.abs(c.g)), 1e-10)) * lr,
            lr,
        )

        f_new, g_new, t, ls_evals = _strong_wolfe(
            fg, c.x, d, t_init, c.f, c.g, tol_change=tol_change
        )
        x_new = c.x + t * d

        s = x_new - c.x
        y = g_new - c.g
        ys = jnp.dot(y, s)
        keep = ys > 1e-10

        def push(c):
            S = jnp.concatenate([c.S[1:], s[None]]) if history > 1 else s[None]
            Y = jnp.concatenate([c.Y[1:], y[None]]) if history > 1 else y[None]
            rho = jnp.concatenate([c.rho[1:], (1.0 / ys)[None]])

            def shift_full(args):
                return args

            def at_count(args):
                # history not yet full: write at position hist instead of rolling
                S, Y, rho = c.S, c.Y, c.rho
                S = S.at[c.hist].set(s)
                Y = Y.at[c.hist].set(y)
                rho = rho.at[c.hist].set(1.0 / ys)
                return S, Y, rho

            S, Y, rho = jax.lax.cond(
                c.hist >= history, shift_full, at_count, (S, Y, rho)
            )
            return c._replace(
                S=S, Y=Y, rho=rho, hist=jnp.minimum(c.hist + 1, history)
            )

        c2_ = jax.lax.cond(keep, push, lambda c: c, c)

        grad_small = jnp.max(jnp.abs(g_new)) <= tol_grad
        step_small = jnp.max(jnp.abs(t * d)) <= tol_change
        f_flat = jnp.abs(f_new - c.f) < tol_change
        degenerate = dd > -tol_change

        return c2_._replace(
            x=x_new, f=f_new, g=g_new,
            n_evals=c.n_evals + ls_evals,
            it=c.it + 1,
            done=grad_small | step_small | f_flat | degenerate,
        )

    out = jax.lax.while_loop(cond_fn, body, init)
    return LbfgsResult(x=out.x, f=out.f, g=out.g, n_evals=out.n_evals, n_iters=out.it)


# Jitted public entry point for eager (host-level) callers.
lbfgs = partial(
    jax.jit, static_argnames=("loss_fn", "max_iter", "max_eval", "history")
)(lbfgs_impl)
