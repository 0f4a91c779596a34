"""Vectorized scalar root finding.

``brent_vec`` is a batched NumPy implementation of Brent's zeroin method with
the same update and stopping rules as ``scipy.optimize.brentq`` (Brent 1973,
ch. 4; the classic `zeroin` scheme).  Given identical function values it
reproduces scipy's iterates exactly, which matters because the reference
constitutive update (/root/reference/src/pylabfea/material.py:501-503) locates
the ML yield surface with ``root_scalar(method='brentq', xtol=1e-5)`` and the
regression contract is tighter than that tolerance — so matching the *iterate
sequence*, not just the bracket, is required.

``brent_jax`` is the jitted device twin (lax.while_loop, mask-converged
lanes) used by the TPU return-map kernel.

Both operate on batches: ``f`` maps an ``(N,)`` vector of abscissae to an
``(N,)`` vector of residuals, each lane independent.
"""
from pylabfea_tpu import config as _config  # noqa: F401 (x64)
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

_RTOL = 4. * np.finfo(float).eps


def brent_vec(f, xa, xb, xtol=1.e-5, rtol=_RTOL, maxiter=100):
    """Batched Brent zeroin.  Each lane i solves f_i(x)=0 in [xa_i, xb_i].

    Returns (root, converged).  Lanes whose bracket does not straddle a sign
    change are returned unconverged with root = xb.
    """
    xa = np.array(xa, dtype=float)
    xb = np.array(xb, dtype=float)
    xpre, xcur = xa.copy(), xb.copy()
    fpre = np.asarray(f(xpre), dtype=float).copy()
    fcur = np.asarray(f(xcur), dtype=float).copy()

    root = xcur.copy()
    done = np.zeros(xa.shape, dtype=bool)
    ok = np.zeros(xa.shape, dtype=bool)
    # endpoint roots
    hit_pre = fpre == 0.
    root[hit_pre] = xpre[hit_pre]
    done |= hit_pre
    ok |= hit_pre
    hit_cur = (~done) & (fcur == 0.)
    root[hit_cur] = xcur[hit_cur]
    done |= hit_cur
    ok |= hit_cur
    bad = (~done) & (fpre * fcur > 0.)
    done |= bad  # no sign change: give up on these lanes

    xblk = np.zeros_like(xpre)
    fblk = np.zeros_like(fpre)
    spre = np.zeros_like(xpre)
    scur = np.zeros_like(xpre)

    for _ in range(maxiter):
        act = ~done
        if not act.any():
            break
        bracket = act & (fpre * fcur < 0.)
        xblk[bracket] = xpre[bracket]
        fblk[bracket] = fpre[bracket]
        spre[bracket] = xcur[bracket] - xpre[bracket]
        scur[bracket] = spre[bracket]

        swap = act & (np.abs(fblk) < np.abs(fcur))
        # rotate (pre <- cur, cur <- blk, blk <- pre) as in zeroin
        xpre_s, fpre_s = xcur[swap], fcur[swap]
        xpre[swap], fpre[swap] = xcur[swap], fcur[swap]
        xcur[swap], fcur[swap] = xblk[swap], fblk[swap]
        xblk[swap], fblk[swap] = xpre_s, fpre_s

        delta = (xtol + rtol * np.abs(xcur)) / 2.
        sbis = (xblk - xcur) / 2.
        conv = act & ((fcur == 0.) | (np.abs(sbis) < delta))
        root[conv] = xcur[conv]
        ok |= conv
        done |= conv
        act = ~done
        if not act.any():
            break

        interp = act & (np.abs(spre) > delta) & (np.abs(fcur) < np.abs(fpre))
        with np.errstate(divide='ignore', invalid='ignore'):
            # secant where only two points, inverse quadratic otherwise
            sec = -fcur * (xcur - xpre) / (fcur - fpre)
            dpre = (fpre - fcur) / (xpre - xcur)
            dblk = (fblk - fcur) / (xblk - xcur)
            iq = -fcur * (fblk * dblk - fpre * dpre) / (dblk * dpre * (fblk - fpre))
        stry = np.where(xpre == xblk, sec, iq)
        accept = interp & (2. * np.abs(stry) <
                           np.minimum(np.abs(spre), 3. * np.abs(sbis) - delta))
        spre_new = np.where(accept, scur, sbis)
        scur_new = np.where(accept, stry, sbis)
        spre[act] = spre_new[act]
        scur[act] = scur_new[act]

        xpre[act] = xcur[act]
        fpre[act] = fcur[act]
        step = np.where(np.abs(scur) > delta, scur,
                        np.where(sbis > 0, delta, -delta))
        xcur[act] = xcur[act] + step[act]
        # evaluate f on all lanes (inactive lanes ignored) — f must be total
        fnew = np.asarray(f(xcur), dtype=float)
        fcur[act] = fnew[act]

    root[~ok & ~done] = xcur[~ok & ~done]
    return root, ok


@partial(jax.jit, static_argnums=(0,))
def brent_jax(f, xa, xb, xtol=1.e-5, rtol=_RTOL, maxiter=100):
    """Jitted batched Brent zeroin; ``f`` must be a traceable (N,)->(N,) map.

    Same update rules as ``brent_vec``; converged lanes freeze while the
    remaining lanes iterate under one ``lax.while_loop``.
    Returns (root, converged).
    """
    xa = jnp.asarray(xa)
    xb = jnp.asarray(xb)
    xtol = jnp.asarray(xtol, dtype=xa.dtype)
    rtol = jnp.asarray(rtol, dtype=xa.dtype)
    fpre0 = f(xa)
    fcur0 = f(xb)
    bad = fpre0 * fcur0 > 0.
    hit_pre = fpre0 == 0.
    hit_cur = (~hit_pre) & (fcur0 == 0.)
    done0 = bad | hit_pre | hit_cur
    ok0 = hit_pre | hit_cur
    root0 = jnp.where(hit_pre, xa, xb)

    def cond(state):
        (it, done, *_ ) = state
        return (it < maxiter) & (~jnp.all(done))

    def body(state):
        (it, done, ok, root, xpre, fpre, xcur, fcur, xblk, fblk, spre, scur) = state
        act = ~done
        bracket = act & (fpre * fcur < 0.)
        xblk = jnp.where(bracket, xpre, xblk)
        fblk = jnp.where(bracket, fpre, fblk)
        spre = jnp.where(bracket, xcur - xpre, spre)
        scur = jnp.where(bracket, xcur - xpre, scur)

        swap = act & (jnp.abs(fblk) < jnp.abs(fcur))
        xpre2 = jnp.where(swap, xcur, xpre)
        fpre2 = jnp.where(swap, fcur, fpre)
        xcur2 = jnp.where(swap, xblk, xcur)
        fcur2 = jnp.where(swap, fblk, fcur)
        xblk2 = jnp.where(swap, xpre2, xblk)
        fblk2 = jnp.where(swap, fpre2, fblk)
        xpre, fpre, xcur, fcur, xblk, fblk = xpre2, fpre2, xcur2, fcur2, xblk2, fblk2

        delta = (xtol + rtol * jnp.abs(xcur)) / 2.
        sbis = (xblk - xcur) / 2.
        conv = act & ((fcur == 0.) | (jnp.abs(sbis) < delta))
        root = jnp.where(conv, xcur, root)
        ok = ok | conv
        done = done | conv
        act = ~done

        interp = act & (jnp.abs(spre) > delta) & (jnp.abs(fcur) < jnp.abs(fpre))
        safe = lambda x: jnp.where(x == 0., 1., x)
        sec = -fcur * (xcur - xpre) / safe(fcur - fpre)
        dpre = (fpre - fcur) / safe(xpre - xcur)
        dblk = (fblk - fcur) / safe(xblk - xcur)
        iq = -fcur * (fblk * dblk - fpre * dpre) / safe(dblk * dpre * (fblk - fpre))
        stry = jnp.where(xpre == xblk, sec, iq)
        accept = interp & (2. * jnp.abs(stry) <
                           jnp.minimum(jnp.abs(spre), 3. * jnp.abs(sbis) - delta))
        spre = jnp.where(act, jnp.where(accept, scur, sbis), spre)
        scur = jnp.where(act, jnp.where(accept, stry, sbis), scur)

        xpre = jnp.where(act, xcur, xpre)
        fpre = jnp.where(act, fcur, fpre)
        step = jnp.where(jnp.abs(scur) > delta, scur,
                         jnp.where(sbis > 0, delta, -delta))
        xnew = jnp.where(act, xcur + step, xcur)
        fnew = f(xnew)
        fcur = jnp.where(act, fnew, fcur)
        return (it + 1, done, ok, root, xpre, fpre, xnew, fcur,
                xblk, fblk, spre, scur)

    z = jnp.zeros_like(xa)
    state = (0, done0, ok0, root0, xa, fpre0, xb, fcur0, z, z, z, z)
    state = jax.lax.while_loop(cond, body, state)
    (_, done, ok, root, _, _, xcur, *_ ) = state
    root = jnp.where(ok, root, xcur)
    return root, ok
