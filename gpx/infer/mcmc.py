"""GP hyperparameter inference drivers: MH, HMC, eHMC, MH-within-Gibbs.

The top-level rebuild of ``Mcmc.sample`` (Mcmc.scala:63-76),
``KernelParameters.sample/sampleHmc/sampleEhmc`` (KernelParameters.scala:
121-246) and the example drivers (SimulatedGp.scala:100-195). Each sampler
compiles to a single XLA program: the full Gram + Cholesky marginal
likelihood runs inside ``lax.scan`` per proposal/leapfrog step, and chains
are vmapped (4 by default, vs the reference's 2 JVM threads —
SimulatedGp.scala:163-165).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax, random

from gpx import params as gparams
from gpx.distributions import Normal
from gpx.infer import base, dual_averaging, ehmc as ehmc_mod, gibbs, hmc, mh
from gpx.infer import nuts as nuts_mod
from gpx.models import gp
from gpx.ops.distance import check_xy
from gpx.params import Parameters
from gpx.utils.pytree import tree_replace


class PosteriorSamples(NamedTuple):
    """MCMC output: constrained parameter draws with names, for diagnostics
    and CSV export (the rebuild of the reference's CSV chain files)."""

    params: Any              # Parameters pytree, leaves (n_chains, n_samples, ...)
    flat: jnp.ndarray        # (n_chains, n_samples, dim) constrained values
    names: list
    accept_rate: jnp.ndarray  # (n_chains,)
    extras: dict


def _gp_log_density(x, y, log_prior, nugget, safe=False,
                    analytic_gradients=False, mesh=None, mesh_axis="data",
                    panel=128, fast_gradients=False):
    if mesh is not None:
        if safe or analytic_gradients:
            raise ValueError(
                "mesh= is its own likelihood path (distributed panel "
                "Cholesky; AD through shard_map IS the distributed "
                "analytic gradient) — combine it with neither safe=True "
                "nor analytic_gradients=True"
            )
        # multi-chip likelihood: Gram, factorization and solves row-sharded
        # over mesh_axis; every jax.grad of the log-posterior (one per
        # leapfrog step) transposes the same collectives (all_gather ->
        # reduce_scatter, psum -> broadcast), so gradient-based samplers
        # run at data sizes no single chip can factor
        from gpx.parallel.dist_chol import distributed_logml

        def log_density(p: Parameters):
            return log_prior(p) + distributed_logml(
                p, x, y, mesh, axis=mesh_axis, nugget=nugget, panel=panel
            )

        return log_density
    if analytic_gradients:
        if safe:
            raise ValueError(
                "analytic_gradients has no nugget-escalation ladder; "
                "use safe=False with it"
            )
        # custom_vjp likelihood: every jax.grad of the log-posterior (one
        # per leapfrog step in HMC/eHMC/NUTS) takes the fused analytic
        # route instead of autodiff through the Cholesky (~10x at N=16k)
        ll = gp.log_marginal_likelihood_analytic_vjp(
            x, y, nugget=nugget, fast_gradients=fast_gradients
        )

        def log_density(p: Parameters):
            return log_prior(p) + ll(p)

        return log_density

    def log_density(p: Parameters):
        return log_prior(p) + gp.log_marginal_likelihood(
            p, x, y, nugget=nugget, safe=safe
        )

    return log_density


def _package(template, bij_tree, unravel, positions, accept_rate, extras):
    """unconstrained flat draws -> constrained Parameters pytree + flat."""

    def one(u_flat):
        c = gparams.constrain(bij_tree, unravel(u_flat))
        return c, gparams.to_array(c)

    cparams, cflat = jax.vmap(jax.vmap(one))(positions)
    return PosteriorSamples(
        params=cparams,
        flat=cflat,
        names=gparams.names(template),
        accept_rate=accept_rate,
        extras=extras,
    )


def _disperse(key, flat0, n_chains, jitter):
    if jitter == 0.0:
        return jnp.broadcast_to(flat0, (n_chains, flat0.size))
    return flat0 + jitter * random.normal(key, (n_chains, flat0.size), flat0.dtype)



def _run_chains(fn, args, *, sequential: bool):
    """Jit-compiled per-chain mapping.

    The outer ``jax.jit`` is ESSENTIAL: a bare ``jax.vmap(run)(...)``
    executes the batched computation eagerly, and on the remote-dispatch
    TPU platform every eagerly dispatched primitive pays the ~27 ms
    host<->device round trip — measured 504 ms/leapfrog-gradient at
    N=4096 vs 4.2 ms for the identical composition under jit (round 3).

    ``sequential=True`` maps chains with ``lax.map`` instead of ``vmap``:
    on the fused Pallas path each evaluation already saturates the chip,
    and batching the single-program Cholesky base tile multiplies its
    scoped-VMEM footprint past the 100 MB limit (vmap(2) of chol_inv_tile
    fails to compile at base=2048 — measured), so big-N chains run
    back-to-back rather than batched."""
    if sequential:
        return jax.jit(lambda *a: lax.map(lambda tup: fn(*tup), a))(*args)
    return jax.jit(jax.vmap(fn))(*args)


def sample_mh(
    key,
    x,
    y,
    template: Parameters,
    log_prior: Callable[[Parameters], jnp.ndarray],
    n_samples: int,
    *,
    proposal_scale: float = 0.15,
    n_chains: int = 4,
    burn_in: int = 0,
    thin: int = 1,
    nugget: float = gp.LOGML_NUGGET,
    init_jitter: float = 0.1,
    safe: bool = False,
    mesh=None,
    mesh_axis: str = "data",
    panel: int = 128,
) -> PosteriorSamples:
    """Metropolis-Hastings over all hyperparameters — the rebuild of
    ``KernelParameters.sample`` + ``ParametersSimulatedGp``
    (KernelParameters.scala:231-246, SimulatedGp.scala:100-166): Gaussian
    random walk on unconstrained (log) space == the reference's log-scale
    proposal, with the Jacobian term it omitted. ``mesh=`` shards every
    likelihood over the distributed panel Cholesky with chains
    back-to-back (1-D data sharding; for chains x data use
    gpx.parallel.sample_mh_2d)."""
    log_density = _gp_log_density(x, y, log_prior, nugget, safe=safe,
                                  mesh=mesh, mesh_axis=mesh_axis, panel=panel)
    sequential = mesh is not None or x.shape[0] >= 8192    # see _run_chains
    return sample_mh_log_density(
        key, template, log_density, n_samples,
        proposal_scale=proposal_scale, n_chains=n_chains, burn_in=burn_in,
        thin=thin, init_jitter=init_jitter, sequential=sequential,
    )


def sample_mh_log_density(
    key,
    template,
    log_density: Callable,
    n_samples: int,
    *,
    proposal_scale: float = 0.15,
    n_chains: int = 4,
    burn_in: int = 0,
    thin: int = 1,
    init_jitter: float = 0.1,
    sequential: bool = False,
) -> PosteriorSamples:
    """Random-walk MH over ANY model: ``template`` is a parameter pytree
    with a ``bijectors()`` method and ``log_density`` maps the constrained
    pytree to a scalar — the bring-your-own-likelihood sampler behind
    :func:`sample_mh` (and e.g. the multi-output models), mirroring the
    reference's generic ``Mcmc`` Kleisli machinery (Mcmc.scala:13-33)
    which its GP code specializes the same way. ``sequential=True`` runs
    chains back-to-back (``lax.map``) instead of vmapped — for densities
    that already saturate the chip (see ``_run_chains``)."""
    logpost, flat0, unravel = mh.make_unconstrained_log_posterior(
        log_density, template
    )
    k_init, k_run = random.split(key)
    inits = _disperse(k_init, flat0, n_chains, init_jitter)
    step = mh.kernel(logpost, mh.gaussian_random_walk(proposal_scale))
    init_states = _run_chains(lambda f: mh.init(f, logpost), (inits,),
                              sequential=sequential)
    result = base.sample_chains(
        step,
        init_states,
        k_run,
        n_samples,
        n_chains,
        burn_in=burn_in,
        thin=thin,
        collect=lambda s: s.position,
        sequential=sequential,
    )
    return _package(
        template, template.bijectors(), unravel, result.samples,
        result.accept_rate, {},
    )


def sample_hmc(
    key,
    x,
    y,
    template: Parameters,
    log_prior: Callable[[Parameters], jnp.ndarray],
    n_samples: int,
    *,
    l: int = 10,
    eps: float | None = None,
    warmup_iters: int = 500,
    adapt_mass: bool = False,
    n_chains: int = 4,
    burn_in: int = 0,
    thin: int = 1,
    nugget: float = gp.LOGML_NUGGET,
    init_jitter: float = 0.1,
    analytic_gradients: bool = False,
    fast_warmup: bool = False,
    gradients: str = "exact",
    probes: int = 64,
    deflate: int | None = None,
    mesh=None,
    mesh_axis: str = "data",
    panel: int = 128,
    chunk_iters: int | None = None,
    program_cache: dict | None = None,
) -> PosteriorSamples:
    """HMC with autodiff gradients through the Cholesky — the rebuild of
    ``KernelParameters.sampleHmc`` (KernelParameters.scala:121-154). When
    ``eps`` is None, each chain tunes its own step size by dual averaging
    (DualAveraging.tuneStepsize, DualAveraging.scala:108-126);
    ``adapt_mass=True`` additionally estimates a per-chain diagonal mass
    matrix in a Stan-style window. ``analytic_gradients=True`` routes every
    leapfrog gradient through the fused analytic path
    (gp.log_marginal_likelihood_analytic_vjp) — ~10x per gradient at
    N=16k. ``fast_warmup=True`` (requires analytic_gradients) runs the
    *warmup* leapfrogs at the 2-pass warmup-grade split (~10%% less MXU
    time per gradient at 16k, PERF.md) while kept draws stay exact.
    Compile-time tradeoff: the warmup density is a SECOND separately-jitted
    custom_vjp program, and this platform has no persistent compile cache —
    at N=16k that roughly doubles the multi-minute first compile to save
    ~10%% of warmup runtime, so it only pays off for long chains (or with
    ``gpx.utils.aot.cached_compile`` absorbing the compiles; see
    docs/large_n.md). CAUTION (measured, PERF.md round 4): combine
    ``fast_warmup`` with a FIXED ``eps`` only — the 2-pass program's
    warmup-grade *value* loosening destroys the O(1)-resolution energy
    differences dual averaging needs at large N (at N=4096 on chip the
    adaptation collapsed: accept 1.0, step size ~0, chains frozen at
    their inits). When ``eps=None``, leave ``fast_warmup=False``.
    Passing a ``jax.sharding.Mesh`` as ``mesh`` instead runs every
    likelihood AND leapfrog gradient through the distributed panel
    Cholesky (gpx.parallel.distributed_logml) with K row-sharded over
    ``mesh_axis`` — multi-chip HMC for data no single chip can factor;
    chains then run back-to-back so each owns the whole mesh.

    ``gradients="hybrid"`` (round 5, VERDICT Next-4) runs every leapfrog
    force through the fixed-probe-key deflated hybrid gradient
    (gp.log_marginal_likelihood_hybrid_vjp — ~62 ms vs ~110 exact at
    N=16k) while the Metropolis accept evaluates the EXACT log-density at
    the trajectory endpoint: the chain targets the exact posterior with
    NO accuracy caveat (the hybrid force is a deterministic position map,
    so the leapfrog stays reversible/volume-preserving; only the accept
    rate pays for force mismatch — hmc.kernel). One exact value per
    trajectory replaces one exact value+gradient per leapfrog step.
    Warmup adapts on the same surrogate-force kernel. ``probes`` /
    ``deflate`` parameterize the hybrid estimator; incompatible with
    ``mesh=`` and with ``fast_warmup``.

    ``chunk_iters`` (round 5): execute warmup and sampling in host-level
    chunks of at most this many iterations per device launch, chains
    back-to-back as separate dispatches (identical math — same per-chain
    keys, same transition ops; state round-trips through the host between
    chunks). Bounds SINGLE-DEVICE-EXECUTION time: at N=16k, 4 chains x
    (256 warmup + 256 kept) x l=8 is one ~20-minute launch under
    ``lax.map``, which this environment's TPU worker kills (the
    ``optimize(chunk_steps=)`` failure mode at sampler scale; ROADMAP
    round 5) — and long single launches are also where preemption/
    watchdog limits live on real fleets. Use ~32-64 at N=16k. Also a
    large COMPILE win at scale: XLA compile time is superlinear in
    program size, and the monolithic warmup+sampling+lax.map program is
    huge (measured on chip at N=512: 2261 s to first result unchunked vs
    53 s chunked). Parity: bitwise-equivalent math, so chunked ==
    unchunked on the CPU lane (tests); ON CHIP the decomposed programs
    compile to different fusions whose ulp-level rounding HMC amplifies
    chaotically, so individual draws diverge from the unchunked run —
    both are equally valid chains targeting the same posterior.

    ``program_cache`` (chunked mode only): pass the SAME dict to repeated
    calls with identical x/y/template/prior/config to reuse the jitted
    chunk programs instead of recompiling them every call (no persistent
    compile cache on this platform) — see
    :func:`_sample_hmc_chunked` for the soundness contract."""
    if gradients not in ("exact", "hybrid"):
        raise ValueError(f"unknown gradients mode: {gradients!r}")
    force_log_density = None
    if gradients == "hybrid":
        if mesh is not None or fast_warmup:
            raise ValueError(
                "gradients='hybrid' is a single-chip surrogate-force mode "
                "— combine it with neither mesh= nor fast_warmup"
            )
        x_arr, y_arr = check_xy(x, y)
        ll_force = gp.log_marginal_likelihood_hybrid_vjp(
            x_arr, y_arr, nugget=nugget, probes=probes, deflate=deflate,
        )

        def force_log_density(p: Parameters):
            return log_prior(p) + ll_force(p)

    log_density = _gp_log_density(
        x, y, log_prior, nugget, analytic_gradients=analytic_gradients,
        mesh=mesh, mesh_axis=mesh_axis, panel=panel,
    )
    warmup_log_density = _fast_warmup_density(
        fast_warmup, analytic_gradients, mesh, x, y, log_prior, nugget,
        eps=eps,
    )
    sequential = (analytic_gradients or mesh is not None
                  or gradients == "hybrid" or x.shape[0] >= 8192)
    return sample_hmc_log_density(
        key, template, log_density, n_samples,
        l=l, eps=eps, warmup_iters=warmup_iters, adapt_mass=adapt_mass,
        n_chains=n_chains, burn_in=burn_in, thin=thin,
        init_jitter=init_jitter, sequential=sequential,
        warmup_log_density=warmup_log_density,
        force_log_density=force_log_density,
        chunk_iters=chunk_iters,
        program_cache=program_cache,
    )


def _fast_warmup_density(fast_warmup, analytic_gradients, mesh, x, y,
                         log_prior, nugget, *, eps):
    # eps is REQUIRED (no sentinel default): eps=None means the caller
    # runs adaptive step sizing, which must trigger the collapse warning
    # below — a forgotten eps= must fail loudly, not skip the diagnostic
    if not fast_warmup:
        return None
    if not analytic_gradients or mesh is not None:
        raise ValueError(
            "fast_warmup=True runs the warmup on the 2-pass fused gradient "
            "path — it requires analytic_gradients=True and no mesh"
        )
    if eps is None and x.shape[0] >= 2048:
        # hard error, not a warning (round-5 fix of VERDICT weak-5): this
        # configuration is MEASURED-BROKEN — a missed warning reproduces a
        # silently frozen sampler
        import os

        if os.environ.get("GPX_UNSAFE_FAST_ADAPT") != "1":
            raise ValueError(
                "fast_warmup=True with adaptive eps (eps=None) at N >= "
                "2048 is a measured-broken configuration: the 2-pass "
                "program's warmup-grade logML loosening collapses dual "
                "averaging (N=4096 on chip: accept 1.0, step size ~0, "
                "chains frozen at their inits — PERF.md round 4). Adapt "
                "eps on the exact program (fast_warmup=False) or pass a "
                "fixed eps; set GPX_UNSAFE_FAST_ADAPT=1 only to reproduce "
                "the PERF.md measurement (benchmarks/sampler_scale.py "
                "--fast-warmup)."
            )
    return _gp_log_density(
        x, y, log_prior, nugget, analytic_gradients=True,
        fast_gradients=True,
    )


def sample_hmc_log_density(
    key,
    template,
    log_density: Callable,
    n_samples: int,
    *,
    l: int = 10,
    eps: float | None = None,
    warmup_iters: int = 500,
    adapt_mass: bool = False,
    n_chains: int = 4,
    burn_in: int = 0,
    thin: int = 1,
    init_jitter: float = 0.1,
    sequential: bool = False,
    warmup_log_density: Callable | None = None,
    force_log_density: Callable | None = None,
    chunk_iters: int | None = None,
    program_cache: dict | None = None,
) -> PosteriorSamples:
    """HMC over ANY model (autodiff gradients of ``log_density`` through
    the bijector lift) — the generic core of :func:`sample_hmc`; see
    :func:`sample_mh_log_density` for the template/log_density contract.
    ``warmup_log_density`` (optional) is a cheaper surrogate used ONLY for
    the step-size / mass warmup phase (e.g. the 2-pass fast-gradient
    likelihood); kept draws always target ``log_density``.
    ``force_log_density`` (optional, exclusive with warmup_log_density):
    surrogate-force mode — its gradient drives every leapfrog (warmup AND
    sampling) while accepts evaluate the exact ``log_density``, keeping
    the exact posterior invariant (hmc.kernel; round 5, VERDICT Next-4).
    ``chunk_iters``: bounded device launches — see :func:`sample_hmc`.
    ``program_cache``: see :func:`sample_hmc`."""
    if force_log_density is not None and warmup_log_density is not None:
        raise ValueError(
            "force_log_density and warmup_log_density are exclusive: the "
            "surrogate-force mode already runs its own (exact-accept) "
            "kernel through warmup"
        )
    logpost, flat0, unravel = mh.make_unconstrained_log_posterior(
        log_density, template
    )
    logpost_wu = logpost if warmup_log_density is None else (
        mh.make_unconstrained_log_posterior(warmup_log_density, template)[0]
    )
    logpost_force = None if force_log_density is None else (
        mh.make_unconstrained_log_posterior(force_log_density, template)[0]
    )
    k_init, k_wu, k_run = random.split(key, 3)
    inits = _disperse(k_init, flat0, n_chains, init_jitter)

    if adapt_mass and eps is not None:
        raise ValueError(
            "adapt_mass=True estimates the mass matrix during the "
            "dual-averaging warmup, which only runs when eps is None"
        )
    if chunk_iters is not None:
        if chunk_iters < 1:
            raise ValueError("chunk_iters must be >= 1")
        return _sample_hmc_chunked(
            template, unravel, logpost, logpost_wu, logpost_force,
            k_wu, k_run, inits, eps=eps, l=l, warmup_iters=warmup_iters,
            adapt_mass=adapt_mass, n_chains=n_chains, n_samples=n_samples,
            burn_in=burn_in, thin=thin, chunk_iters=chunk_iters,
            program_cache=program_cache,
        )
    mass_c = None
    if eps is None:
        wu_keys = random.split(k_wu, n_chains)
        if adapt_mass:
            eps_c, mass_c, inits = _run_chains(
                lambda kk, q: dual_averaging.window_warmup(
                    kk, q, logpost_wu, l0=l,
                    init_window=warmup_iters // 3,
                    mass_window=warmup_iters // 3,
                    final_window=warmup_iters // 3,
                    force_log_posterior=logpost_force,
                ),
                (wu_keys, inits), sequential=sequential,
            )
        else:
            eps_c, inits = _run_chains(
                lambda kk, q: dual_averaging.warmup(
                    kk, q, logpost_wu, warmup_iters, l,
                    force_log_posterior=logpost_force,
                ),
                (wu_keys, inits), sequential=sequential,
            )
    else:
        eps_c = jnp.full((n_chains,), eps, dtype=flat0.dtype)

    def run_one(kk, q0, eps_i, mass_i):
        step = hmc.kernel(logpost, eps_i, l, mass=mass_i,
                          force_log_posterior=logpost_force)
        return base.sample(
            step,
            hmc.init(q0, logpost, logpost_force),
            kk,
            n_samples,
            burn_in=burn_in,
            thin=thin,
            collect=lambda s: s.position,
        )

    if mass_c is None:
        runner = lambda kk, q0, eps_i: run_one(kk, q0, eps_i, None)
        result = _run_chains(
            runner, (random.split(k_run, n_chains), inits, eps_c),
            sequential=sequential,
        )
        extras = {"eps": eps_c}
    else:
        result = _run_chains(
            run_one, (random.split(k_run, n_chains), inits, eps_c, mass_c),
            sequential=sequential,
        )
        extras = {"eps": eps_c, "mass": mass_c}
    return _package(
        template, template.bijectors(), unravel, result.samples,
        result.accept_rate, extras,
    )


def _build_chunk_programs(logpost, logpost_wu, logpost_force, *, l, thin,
                          delta):
    """Build the jitted per-chunk programs for the host-chunked HMC driver.

    All programs take the per-chain quantities (``mu``, ``eps``, ``mass``)
    as traced ARGUMENTS, so chain 2+ and every chunk reuse chain 1's
    compilations (at N=16k each extra compile is minutes; a per-chain
    closure would recompile them all)."""

    def _pieces(lp):
        if logpost_force is None:
            return jax.value_and_grad(lp), None
        return jax.value_and_grad(logpost_force), lp

    vag_wu, value_wu = _pieces(logpost_wu)
    vag_s, value_s = _pieces(logpost)

    find_eps = jax.jit(
        lambda k, q, mass: dual_averaging.find_reasonable_epsilon(
            k, q, logpost_wu, mass, logpost_force
        )
    )
    init_wu = jax.jit(lambda q: hmc.init(q, logpost_wu, logpost_force))
    init_s = jax.jit(lambda q: hmc.init(q, logpost, logpost_force))

    @jax.jit
    def da_chunk(carry, ms, ks, mu, mass):
        body = dual_averaging._da_body(vag_wu, value_wu, mu, delta, mass, l)
        return lax.scan(body, carry, (ms, ks))

    @jax.jit
    def mass_chunk(state, ks, eps0):
        def body(s, kk):
            s2, _ = hmc._step(kk, s, vag_wu, eps0, l, None, value_fn=value_wu)
            return s2, s2.position

        return lax.scan(body, state, ks)

    @jax.jit
    def burn_chunk(state, ks, eps_i, mass_i):
        def body(s, k):
            s2, _ = hmc._step(k, s, vag_s, eps_i, l, mass_i, value_fn=value_s)
            return s2, None

        return lax.scan(body, state, ks)

    @jax.jit
    def samp_chunk(state, ks, eps_i, mass_i):
        def keep_body(s, k):
            def inner(ss, kk):
                s2, _ = hmc._step(kk, ss, vag_s, eps_i, l, mass_i,
                                  value_fn=value_s)
                return s2, None

            s2, _ = lax.scan(inner, s, random.split(k, thin))
            return s2, s2.position

        return lax.scan(keep_body, state, ks)

    return dict(find_eps=find_eps, init_wu=init_wu, init_s=init_s,
                da_chunk=da_chunk, mass_chunk=mass_chunk,
                burn_chunk=burn_chunk, samp_chunk=samp_chunk)


def _sample_hmc_chunked(template, unravel, logpost, logpost_wu, logpost_force,
                        k_wu, k_run, inits, *, eps, l, warmup_iters,
                        adapt_mass, n_chains, n_samples, burn_in, thin,
                        chunk_iters, delta=0.65, program_cache=None):
    """Host-chunked HMC driver: the same per-chain math as the unchunked
    path (identical key tree, identical transition/warmup ops), executed
    as bounded device launches — chains back-to-back as separate
    dispatches, every scan split into <= ``chunk_iters``-iteration chunks
    with the chain state round-tripping through the host in between.

    ``program_cache`` (opt-in, default off): a caller-held dict the jitted
    chunk programs persist in ACROSS sample calls. Without it a repeat
    call rebuilds fresh ``jax.jit`` wrappers and — this platform has no
    persistent compile cache — pays the full multi-minute N=16k recompile
    again. ONLY sound when every call sees the same model: the cached
    programs close over the FIRST call's log densities, so x/y/template
    structure/prior/gradient flags must be unchanged (the benchmark
    re-timing pattern). ``l``/``thin``/``delta`` are validated; the data
    itself cannot be and is the caller's contract."""
    if program_cache is not None and "progs" in program_cache:
        if program_cache["static"] != (l, thin, delta):
            raise ValueError(
                "program_cache was built with (l, thin, delta)="
                f"{program_cache['static']}, got {(l, thin, delta)} — "
                "use a fresh cache dict per sampler configuration"
            )
        progs = program_cache["progs"]
    else:
        progs = _build_chunk_programs(
            logpost, logpost_wu, logpost_force, l=l, thin=thin, delta=delta
        )
        if program_cache is not None:
            program_cache["progs"] = progs
            program_cache["static"] = (l, thin, delta)
    find_eps = progs["find_eps"]
    init_wu = progs["init_wu"]
    init_s = progs["init_s"]
    da_chunk = progs["da_chunk"]
    mass_chunk = progs["mass_chunk"]
    burn_chunk = progs["burn_chunk"]
    samp_chunk = progs["samp_chunk"]

    def _warmup_one(kk, q0, mass, n_iters):
        # mirrors dual_averaging.warmup: same key split, same DA state
        k_eps, k_scan = random.split(kk)
        eps0 = jax.block_until_ready(find_eps(k_eps, q0, mass))
        mu = jnp.log(10.0 * eps0)
        carry = (
            init_wu(q0),
            dual_averaging.DAState(
                log_eps=jnp.log(eps0),
                log_eps_bar=jnp.zeros_like(eps0),
                h_bar=jnp.zeros_like(eps0),
            ),
        )
        ms = jnp.arange(1, n_iters + 1)
        ks = random.split(k_scan, n_iters)
        for i in range(0, n_iters, chunk_iters):
            carry, _ = da_chunk(carry, ms[i:i + chunk_iters],
                                ks[i:i + chunk_iters], mu, mass)
            carry = jax.block_until_ready(carry)
        hstate, da = carry
        return jnp.exp(da.log_eps_bar), hstate.position

    def _window_warmup_one(kk, q0):
        # mirrors dual_averaging.window_warmup (equal thirds, as the
        # unchunked sample_hmc_log_density configures it)
        k1, k2, k3 = random.split(kk, 3)
        w = warmup_iters // 3
        eps0, q1 = _warmup_one(k1, q0, None, w)
        state = init_wu(q1)
        ks = random.split(k2, w)
        draws = []
        for i in range(0, w, chunk_iters):
            state, d = mass_chunk(state, ks[i:i + chunk_iters], eps0)
            state = jax.block_until_ready(state)
            draws.append(d)
        var = jnp.var(jnp.concatenate(draws), axis=0) + 1e-6
        mass = 1.0 / var
        eps_f, qf = _warmup_one(k3, state.position, mass, w)
        return eps_f, mass, qf

    # --- warmup, one chain at a time -----------------------------------
    mass_c = None
    if eps is None:
        wu_keys = random.split(k_wu, n_chains)
        eps_l, mass_l, q_l = [], [], []
        for c in range(n_chains):
            if adapt_mass:
                e, m, q = _window_warmup_one(wu_keys[c], inits[c])
                mass_l.append(m)
            else:
                e, q = _warmup_one(wu_keys[c], inits[c], None, warmup_iters)
            eps_l.append(e)
            q_l.append(q)
        eps_c = jnp.stack(eps_l)
        inits = jnp.stack(q_l)
        if adapt_mass:
            mass_c = jnp.stack(mass_l)
    else:
        eps_c = jnp.full((n_chains,), eps, dtype=inits.dtype)

    # --- sampling, one chain at a time, chunked scans ------------------
    run_keys = random.split(k_run, n_chains)
    pos_l, acc_l = [], []
    for c in range(n_chains):
        state = init_s(inits[c])
        key_c = run_keys[c]
        mass_i = None if mass_c is None else mass_c[c]
        if burn_in > 0:
            kb, key_c = random.split(key_c)
            bkeys = random.split(kb, burn_in)
            for i in range(0, burn_in, chunk_iters):
                state, _ = burn_chunk(state, bkeys[i:i + chunk_iters],
                                      eps_c[c], mass_i)
                state = jax.block_until_ready(state)
        kkeys = random.split(key_c, n_samples)
        chunks = []
        for i in range(0, n_samples, chunk_iters):
            state, d = samp_chunk(state, kkeys[i:i + chunk_iters],
                                  eps_c[c], mass_i)
            state = jax.block_until_ready(state)
            chunks.append(d)
        pos_l.append(jnp.concatenate(chunks))
        acc_l.append(base._accept_rate(state, burn_in + n_samples * thin))

    positions = jnp.stack(pos_l)
    accept = jnp.stack(acc_l)
    extras = {"eps": eps_c}
    if mass_c is not None:
        extras["mass"] = mass_c
    return _package(
        template, template.bijectors(), unravel, positions, accept, extras
    )


def sample_ehmc(
    key,
    x,
    y,
    template: Parameters,
    log_prior: Callable[[Parameters], jnp.ndarray],
    n_samples: int,
    *,
    l0: int = 10,
    warmup_iters: int = 500,
    k: int = 2000,
    l_max: int = 256,
    n_chains: int = 4,
    burn_in: int = 0,
    thin: int = 1,
    nugget: float = gp.LOGML_NUGGET,
    init_jitter: float = 0.1,
    analytic_gradients: bool = False,
    mesh=None,
    mesh_axis: str = "data",
    panel: int = 128,
) -> PosteriorSamples:
    """Empirical HMC — the rebuild of ``KernelParameters.sampleEhmc``
    (KernelParameters.scala:169-198), whole pipeline vmapped per chain.
    ``k`` (size of the empirical U-turn-length distribution) defaults to the
    reference's 2000 (Ehmc.scala:95); each warmup length measurement costs a
    full trajectory of logML+grad evals, so lower it for quick runs.
    ``mesh=`` runs every likelihood/gradient through the distributed
    panel Cholesky (see sample_hmc)."""
    log_density = _gp_log_density(
        x, y, log_prior, nugget, analytic_gradients=analytic_gradients,
        mesh=mesh, mesh_axis=mesh_axis, panel=panel,
    )
    return sample_ehmc_log_density(
        key, template, log_density, n_samples,
        l0=l0, warmup_iters=warmup_iters, k=k, l_max=l_max,
        n_chains=n_chains, burn_in=burn_in, thin=thin,
        init_jitter=init_jitter,
        sequential=analytic_gradients or mesh is not None
        or x.shape[0] >= 8192,
    )


def sample_ehmc_log_density(
    key,
    template,
    log_density: Callable,
    n_samples: int,
    *,
    l0: int = 10,
    warmup_iters: int = 500,
    k: int = 2000,
    l_max: int = 256,
    n_chains: int = 4,
    burn_in: int = 0,
    thin: int = 1,
    init_jitter: float = 0.1,
    sequential: bool = False,
) -> PosteriorSamples:
    """Empirical HMC over ANY model — the generic core of
    :func:`sample_ehmc`; see :func:`sample_mh_log_density` for the
    template/log_density contract."""
    logpost, flat0, unravel = mh.make_unconstrained_log_posterior(
        log_density, template
    )
    k_init, k_run = random.split(key)
    inits = _disperse(k_init, flat0, n_chains, init_jitter)

    def run_one(kk, q0):
        result, extras = ehmc_mod.sample(
            logpost,
            q0,
            kk,
            n_samples,
            l0=l0,
            warmup_iters=warmup_iters,
            k=k,
            l_max=l_max,
            burn_in=burn_in,
            thin=thin,
        )
        return result, extras

    result, extras = _run_chains(
        run_one, (random.split(k_run, n_chains), inits),
        sequential=sequential,
    )
    return _package(
        template, template.bijectors(), unravel, result.samples,
        result.accept_rate, extras,
    )


def sample_nuts(
    key,
    x,
    y,
    template: Parameters,
    log_prior: Callable[[Parameters], jnp.ndarray],
    n_samples: int,
    *,
    max_depth: int = 8,
    eps: float | None = None,
    warmup_iters: int = 500,
    n_chains: int = 4,
    burn_in: int = 0,
    thin: int = 1,
    nugget: float = gp.LOGML_NUGGET,
    init_jitter: float = 0.1,
    analytic_gradients: bool = False,
    fast_warmup: bool = False,
    adapt_mass: bool = False,
    mesh=None,
    mesh_axis: str = "data",
    panel: int = 128,
) -> PosteriorSamples:
    """No-U-Turn sampling over all hyperparameters — the flagship sampler,
    beyond the reference (whose answer to path-length tuning is empirical
    HMC, KernelParameters.sampleEhmc / Ehmc.scala:101-123). Per chain:
    find-reasonable-epsilon + dual-averaging warmup (when ``eps`` is None),
    then iterative multinomial NUTS (gpx.infer.nuts); chains are vmapped
    with independent keys and over-dispersed starts. Extras report the
    adapted ``eps`` and per-draw tree ``depth``.

    ``adapt_mass=True`` adds Stan-style diagonal mass adaptation per chain
    (window_warmup): on anisotropic GP posteriors the unit metric forces
    deep trees along the tight direction — the adapted metric cuts tree
    depth and lifts ESS (tested in tests/test_mcmc_gp.py). Extras then
    also carry the per-chain ``mass``. ``mesh=`` routes every likelihood
    and gradient through the distributed panel Cholesky (multi-chip NUTS;
    see sample_hmc)."""
    log_density = _gp_log_density(
        x, y, log_prior, nugget, analytic_gradients=analytic_gradients,
        mesh=mesh, mesh_axis=mesh_axis, panel=panel,
    )
    warmup_log_density = _fast_warmup_density(
        fast_warmup, analytic_gradients, mesh, x, y, log_prior, nugget,
        eps=eps,
    )
    return sample_nuts_log_density(
        key, template, log_density, n_samples,
        max_depth=max_depth, eps=eps, warmup_iters=warmup_iters,
        adapt_mass=adapt_mass, n_chains=n_chains, burn_in=burn_in,
        thin=thin, init_jitter=init_jitter,
        sequential=analytic_gradients or mesh is not None
        or x.shape[0] >= 8192,
        warmup_log_density=warmup_log_density,
    )


def sample_nuts_log_density(
    key,
    template,
    log_density: Callable,
    n_samples: int,
    *,
    max_depth: int = 8,
    eps: float | None = None,
    warmup_iters: int = 500,
    adapt_mass: bool = False,
    n_chains: int = 4,
    burn_in: int = 0,
    thin: int = 1,
    init_jitter: float = 0.1,
    sequential: bool = False,
    warmup_log_density: Callable | None = None,
) -> PosteriorSamples:
    """NUTS over ANY model — the generic core of :func:`sample_nuts`; see
    :func:`sample_mh_log_density` for the template/log_density contract.
    ``warmup_log_density``: cheaper surrogate for the warmup phase only
    (see :func:`sample_hmc_log_density`)."""
    logpost, flat0, unravel = mh.make_unconstrained_log_posterior(
        log_density, template
    )
    logpost_wu = None if warmup_log_density is None else (
        mh.make_unconstrained_log_posterior(warmup_log_density, template)[0]
    )
    k_init, k_run = random.split(key)
    inits = _disperse(k_init, flat0, n_chains, init_jitter)

    def run_one(kk, q0):
        return nuts_mod.sample(
            logpost,
            q0,
            kk,
            n_samples,
            max_depth=max_depth,
            eps=eps,
            warmup_iters=warmup_iters,
            burn_in=burn_in,
            thin=thin,
            adapt_mass=adapt_mass,
            collect=lambda s: (s.position, s.depth),
            warmup_log_posterior=logpost_wu,
        )

    (result, extras) = _run_chains(
        run_one, (random.split(k_run, n_chains), inits),
        sequential=sequential,
    )
    positions, depths = result.samples
    extras = dict(extras, depth=depths)
    return _package(
        template, template.bijectors(), unravel, positions,
        result.accept_rate, extras,
    )


def sample_mh_within_gibbs(
    key,
    x,
    y,
    template: Parameters,
    log_prior_kernel: Callable,
    prior_mean: Normal,
    n_samples: int,
    *,
    proposal_scale: float = 0.15,
    n_chains: int = 4,
    burn_in: int = 0,
    thin: int = 1,
    nugget: float = gp.LOGML_NUGGET,
    mean_nugget: float = 1e-6,
) -> PosteriorSamples:
    """Metropolis-within-Gibbs — the rebuild of ``Mcmc.sample``
    (Mcmc.scala:63-76): per iteration, a conjugate Gibbs draw of the plane
    mean (MeanParameters.samplePlane) composed with an MH move on the kernel
    hyperparameters, exactly the reference's Kleisli composition."""
    bij_k = template.kernel.bijectors()
    u_k0 = gparams.unconstrain(bij_k, template.kernel)
    _, unravel_k = gparams.unraveler(u_k0)

    def step(kk, state):
        params, accepted = state
        k_mean, k_prop, k_acc = random.split(kk, 3)
        params = gibbs.sample_mean(
            k_mean, prior_mean, x, y, params, nugget=mean_nugget
        )

        u = gparams.to_array(gparams.unconstrain(bij_k, params.kernel))

        def logpost(uf):
            kern = gparams.constrain(bij_k, unravel_k(uf))
            p = tree_replace(params, kernel=kern)
            return (
                log_prior_kernel(kern)
                + gp.log_marginal_likelihood(p, x, y, nugget=nugget)
                + gparams.log_det_jacobian(bij_k, unravel_k(uf))
            )

        prop = u + proposal_scale * random.normal(k_prop, u.shape, u.dtype)
        lp_cur = logpost(u)
        lp_prop = logpost(prop)
        lp_prop = jnp.where(jnp.isnan(lp_prop), -jnp.inf, lp_prop)
        accept = jnp.log(random.uniform(k_acc)) < (lp_prop - lp_cur)
        u_new = jnp.where(accept, prop, u)
        kern_new = gparams.constrain(bij_k, unravel_k(u_new))
        return (
            tree_replace(params, kernel=kern_new),
            accepted + accept.astype(jnp.int32),
        )

    k_run = key
    init_state = (template, jnp.zeros((), jnp.int32))

    def collect(state):
        return state[0]

    class _GibbsState(NamedTuple):
        params: Any
        accepted: jnp.ndarray

    def step_named(kk, s: _GibbsState):
        p, a = step(kk, (s.params, s.accepted))
        return _GibbsState(p, a)

    result = base.sample_chains(
        step_named,
        _GibbsState(*init_state),
        k_run,
        n_samples,
        n_chains,
        burn_in=burn_in,
        thin=thin,
        sequential=x.shape[0] >= 8192,     # see _run_chains
        collect=lambda s: s.params,
    )
    flat = jax.vmap(jax.vmap(gparams.to_array))(result.samples)
    return PosteriorSamples(
        params=result.samples,
        flat=flat,
        names=gparams.names(template),
        accept_rate=result.accept_rate,
        extras={},
    )
