"""Single-evaluation-site optimizer loop: Adam warm-up + L-BFGS with
strong-Wolfe line search, as ONE lax.while_loop whose body contains exactly
one call to the loss/gradient function.

Motivation: the straightforward composition (warm-up scan + L-BFGS with
evaluations inside bracket/zoom branches) inlines the differentiable render
4x into the tracking executable. Program size directly costs dispatch
overhead in this environment (~200 ms fixed per call of the large tracking
program), and doubles compile times. Here every phase — warm-up step,
line-search trial, zoom — evaluates at a branchlessly-chosen point, then
updates its state with cheap selects, so the expensive subgraph appears
exactly once.

Semantics follow torch.optim.LBFGS(strong_wolfe) closely (history ring,
two-loop recursion, cubic-interpolation bracket/zoom, first-step scaling
lr*min(1, 1/|g|_1)); the evaluation budget counts warm-up + L-BFGS
evaluations together like the reference's closure counter
(/root/reference/gslam/frontend.py:622-658).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

# modes
WARMUP, INIT, TRIAL, ZOOM, DONE = 0, 1, 2, 3, 4

C1 = 1e-4
C2 = 0.9


def _cubic_min(x1, f1, g1, x2, f2, g2, lo, hi):
    d1 = g1 + g2 - 3 * (f1 - f2) / (x1 - x2)
    d2_sq = d1 * d1 - g1 * g2
    ok = d2_sq >= 0
    d2 = jnp.sqrt(jnp.where(ok, d2_sq, 0.0)) * jnp.sign(x2 - x1)
    t = x2 - (x2 - x1) * ((g2 + d2 - d1) / (g2 - g1 + 2 * d2))
    t = jnp.where(ok & jnp.isfinite(t), t, 0.5 * (lo + hi))
    return jnp.clip(t, lo, hi)


class _Carry(NamedTuple):
    mode: jax.Array
    x: jax.Array  # current accepted parameters (line-search base)
    f: jax.Array  # best-known f at x (valid from INIT onward)
    g: jax.Array  # gradient at x
    d: jax.Array  # search direction
    dd0: jax.Array  # directional derivative at t=0
    t: jax.Array  # next trial step
    # previous trial (bracket phase)
    t_prev: jax.Array
    f_prev: jax.Array
    d_prev: jax.Array
    g_prev: jax.Array  # gradient at the previous trial point
    # zoom bracket
    t_lo: jax.Array
    f_lo: jax.Array
    dd_lo: jax.Array
    g_lo: jax.Array
    t_hi: jax.Array
    f_hi: jax.Array
    dd_hi: jax.Array
    insuf: jax.Array
    # history
    S: jax.Array
    Y: jax.Array
    rho: jax.Array
    hist: jax.Array
    # adam state (warm-up)
    mu: jax.Array
    nu: jax.Array
    # counters
    n_evals: jax.Array
    it: jax.Array
    warm: jax.Array


def _direction(c: _Carry, history: int) -> jax.Array:
    def first(_):
        return -c.g

    def recur(_):
        q = -c.g

        def bwd(i, carry):
            q, alpha = carry
            idx = c.hist - 1 - i
            valid = idx >= 0
            idx_s = jnp.maximum(idx, 0)
            s, y, r = c.S[idx_s], c.Y[idx_s], c.rho[idx_s]
            a = r * jnp.dot(s, q)
            q = jnp.where(valid, q - a * y, q)
            alpha = alpha.at[idx_s].set(jnp.where(valid, a, alpha[idx_s]))
            return q, alpha

        q, alpha = jax.lax.fori_loop(0, history, bwd, (q, jnp.zeros(history)))
        newest = jnp.maximum(c.hist - 1, 0)
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


# NOT @jit: called from inside track_frame's jit, and a nested jit call
# boundary deoptimizes XLA:TPU scatter compilation program-wide (see
# gslam_tpu/ops/rasterize.py compute_bins note). Jitted alias below for
# eager callers.
def warmup_lbfgs_impl(
    loss_fn: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    warmup_steps: int = 10,
    max_iter: int = 20,
    max_eval: int = 25,
    history: int = 5,
    lr: float = 1.0,
    warmup_lr: float | None = None,
    tol_grad: float = 1e-7,
    tol_change: float = 1e-9,
    fixed_trip: bool = True,
):
    """Returns (x, f, total_evals). total budget = warmup + 1 + max_eval.

    With fixed_trip (default) the loop is a static-length lax.scan — on TPU
    a while_loop iteration containing a Pallas call pays a large pipeline
    stall (~2-3x per-iteration cost), and tracking uses its full budget on
    most frames anyway. Converged iterations pass through unchanged.
    """
    fg = jax.value_and_grad(loss_fn)
    dim = x0.shape[0]
    wlr = lr if warmup_lr is None else warmup_lr

    zero = jnp.zeros(())
    init = _Carry(
        mode=jnp.array(WARMUP if warmup_steps > 0 else INIT, jnp.int32),
        x=x0, f=jnp.array(jnp.inf), g=jnp.zeros(dim),
        d=jnp.zeros(dim), dd0=zero, t=zero,
        t_prev=zero, f_prev=zero, d_prev=zero, g_prev=jnp.zeros(dim),
        t_lo=zero, f_lo=zero, dd_lo=zero, g_lo=jnp.zeros(dim),
        t_hi=zero, f_hi=zero, dd_hi=zero,
        insuf=jnp.array(False),
        S=jnp.zeros((history, dim)), Y=jnp.zeros((history, dim)),
        rho=jnp.zeros(history), hist=jnp.array(0, jnp.int32),
        mu=jnp.zeros(dim), nu=jnp.zeros(dim),
        n_evals=jnp.array(0, jnp.int32), it=jnp.array(0, jnp.int32),
        warm=jnp.array(0, jnp.int32),
    )
    budget = warmup_steps + 1 + max_eval

    def eval_point(c: _Carry) -> jax.Array:
        return jnp.where(
            (c.mode == WARMUP) | (c.mode == INIT), c.x, c.x + c.t * c.d
        )

    def start_search(c: _Carry, x_new, f_new, g_new) -> _Carry:
        """Accept x_new as the new iterate and set up the next line search."""
        s = x_new - c.x
        y = g_new - c.g
        ys = jnp.dot(y, s)
        keep = (ys > 1e-10) & (c.mode != INIT) & jnp.isfinite(ys)

        def push(args):
            S, Y, rho, hist = args
            idx = jnp.minimum(hist, history - 1)
            roll = hist >= history
            S = jnp.where(roll, jnp.roll(S, -1, 0), S).at[idx].set(s)
            Y = jnp.where(roll, jnp.roll(Y, -1, 0), Y).at[idx].set(y)
            rho = jnp.where(roll, jnp.roll(rho, -1), rho).at[idx].set(1.0 / ys)
            return S, Y, rho, jnp.minimum(hist + 1, history)

        S, Y, rho, hist = jax.lax.cond(
            keep, push, lambda a: a, (c.S, c.Y, c.rho, c.hist)
        )
        c = c._replace(x=x_new, f=f_new, g=g_new, S=S, Y=Y, rho=rho, hist=hist)

        d = _direction(c, history)
        dd0 = jnp.dot(g_new, d)
        t_init = jnp.where(
            c.it == 0,
            jnp.minimum(1.0, 1.0 / jnp.maximum(jnp.sum(jnp.abs(g_new)), 1e-10))
            * lr,
            jnp.asarray(lr),
        )
        grad_small = jnp.max(jnp.abs(g_new)) <= tol_grad
        degenerate = dd0 > -tol_change
        out_of_iters = c.it + 1 > max_iter
        done = grad_small | degenerate | out_of_iters
        return c._replace(
            mode=jnp.where(done, DONE, TRIAL).astype(jnp.int32),
            d=d, dd0=dd0, t=t_init,
            t_prev=jnp.zeros(()), f_prev=f_new, d_prev=dd0, g_prev=g_new,
            it=c.it + 1,
        )

    def update(c: _Carry, f, g) -> _Carry:
        dd = jnp.dot(g, c.d)
        c = c._replace(n_evals=c.n_evals + 1)

        def do_warmup(c):
            t = (c.warm + 1).astype(jnp.float32)
            mu = 0.9 * c.mu + 0.1 * g
            nu = 0.999 * c.nu + 0.001 * g * g
            step = wlr * (mu / (1 - 0.9**t)) / (
                jnp.sqrt(nu / (1 - 0.999**t)) + 1e-8
            )
            mode = jnp.where(c.warm + 1 >= warmup_steps, INIT, WARMUP)
            return c._replace(
                x=c.x - step, mu=mu, nu=nu, warm=c.warm + 1,
                mode=mode.astype(jnp.int32),
            )

        def do_init(c):
            return start_search(c._replace(mode=jnp.array(INIT, jnp.int32),
                                           f=f, g=g), c.x, f, g)

        def do_trial(c):
            armijo_fail = (f > c.f + C1 * c.t * c.dd0) | (
                (c.t_prev > 0) & (f >= c.f_prev)
            )
            wolfe_ok = jnp.abs(dd) <= -C2 * c.dd0
            ascent = dd >= 0

            def to_zoom_pc(c):  # bracket [prev, cur]
                return c._replace(
                    mode=jnp.array(ZOOM, jnp.int32),
                    t_lo=c.t_prev, f_lo=c.f_prev, dd_lo=c.d_prev,
                    g_lo=c.g_prev,
                    t_hi=c.t, f_hi=f, dd_hi=dd,
                )

            def accept(c):
                return start_search(c, c.x + c.t * c.d, f, g)

            def to_zoom_cp(c):  # bracket [cur, prev]
                return c._replace(
                    mode=jnp.array(ZOOM, jnp.int32),
                    t_lo=c.t, f_lo=f, dd_lo=dd, g_lo=g,
                    t_hi=c.t_prev, f_hi=c.f_prev, dd_hi=c.d_prev,
                )

            def extrapolate(c):
                lo = c.t + 0.01 * (c.t - c.t_prev)
                hi = c.t * 10.0
                t_new = _cubic_min(c.t_prev, c.f_prev, c.d_prev,
                                   c.t, f, dd, lo, hi)
                return c._replace(
                    t_prev=c.t, f_prev=f, d_prev=dd, g_prev=g, t=t_new,
                )

            branch = jnp.where(
                armijo_fail, 0, jnp.where(wolfe_ok, 1, jnp.where(ascent, 2, 3))
            )
            return jax.lax.switch(
                branch, [to_zoom_pc, accept, to_zoom_cp, extrapolate], c
            )

        def do_zoom(c):
            # c.t was the zoom trial; classify the fresh (f, g, dd)
            armijo_fail = (f > c.f + C1 * c.t * c.dd0) | (f >= c.f_lo)
            wolfe_ok = jnp.abs(dd) <= -C2 * c.dd0

            def shrink_hi(c):
                return c._replace(t_hi=c.t, f_hi=f, dd_hi=dd)

            def accept(c):
                return start_search(c, c.x + c.t * c.d, f, g)

            def move_lo(c):
                crossed = dd * (c.t_hi - c.t_lo) >= 0
                c = jax.lax.cond(
                    crossed,
                    lambda c: c._replace(
                        t_hi=c.t_lo, f_hi=c.f_lo, dd_hi=c.dd_lo
                    ),
                    lambda c: c, c,
                )
                return c._replace(t_lo=c.t, f_lo=f, dd_lo=dd, g_lo=g)

            c = jax.lax.cond(
                armijo_fail, shrink_hi,
                lambda c: jax.lax.cond(wolfe_ok, accept, move_lo, c), c,
            )

            def next_trial(c):
                lo = jnp.minimum(c.t_lo, c.t_hi)
                hi = jnp.maximum(c.t_lo, c.t_hi)
                gap = hi - lo
                t_new = _cubic_min(c.t_lo, c.f_lo, c.dd_lo,
                                   c.t_hi, c.f_hi, c.dd_hi, lo, hi)
                eps = 0.1 * gap
                close = jnp.minimum(hi - t_new, t_new - lo) < eps
                t_new = jnp.where(
                    close & (c.insuf | (t_new >= hi) | (t_new <= lo)),
                    jnp.where(t_new > 0.5 * (lo + hi), hi - eps, lo + eps),
                    t_new,
                )
                tiny = gap * jnp.abs(c.dd0) < tol_change
                # give up the search if the bracket collapses: accept t_lo
                return jax.lax.cond(
                    tiny,
                    lambda c: start_search(c, c.x + c.t_lo * c.d, c.f_lo,
                                           c.g_lo),
                    lambda c: c._replace(t=t_new, insuf=close),
                    c,
                )

            return jax.lax.cond(c.mode == ZOOM, next_trial, lambda c: c, c)

        return jax.lax.switch(
            jnp.minimum(c.mode, 3), [do_warmup, do_init, do_trial, do_zoom], c
        )

    def cond_fn(c: _Carry):
        return (c.mode != DONE) & (c.n_evals < budget)

    if fixed_trip:
        # The expensive evaluation runs unconditionally every scan step so
        # XLA pipelines it (an eval under cond/while stalls ~2-3x); only the
        # cheap state update is gated once the search has converged.
        def step(c, _):
            p = eval_point(c)
            f, g = fg(p)
            c = jax.lax.cond(
                cond_fn(c), lambda c: update(c, f, g), lambda c: c, c
            )
            return c, None

        out, _ = jax.lax.scan(step, init, None, length=budget)
    else:
        def body(c):
            p = eval_point(c)
            f, g = fg(p)
            return update(c, f, g)

        out = jax.lax.while_loop(cond_fn, body, init)
    return out.x, out.f, out.n_evals


# Jitted public entry point for eager (host-level) callers.
warmup_lbfgs = partial(
    jax.jit,
    static_argnames=("loss_fn", "warmup_steps", "max_iter", "max_eval",
                     "history", "fixed_trip"),
)(warmup_lbfgs_impl)
