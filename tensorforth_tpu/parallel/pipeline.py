"""Pipeline parallelism — GPipe-style microbatch pipeline over a 'pp'
mesh axis.

The reference left this as a comment ("TODO: model execution becomes a
superscalar pipeline", forward.cu:42).  TPU-first realization: S
identical stages (e.g. repeated attention blocks) hold their parameters
stage-major on S devices; microbatches circulate with
`jax.lax.ppermute` inside a `shard_map`, so stage i computes microbatch
j while stage i+1 computes microbatch j-1.  The whole pipeline is
differentiable (ppermute has a transpose rule), so `jax.grad` of a
pipelined loss trains all stages.

Schedule: T = n_micro + S - 1 ticks; device d applies its stage at tick
t to the activation that entered the pipe at tick t-d.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map                      # jax >= 0.8
except ImportError:                                # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_pp_mesh(n_stages: int) -> Mesh:
    devs = jax.devices()[:n_stages]
    return Mesh(np.array(devs), ("pp",))


def pipeline_apply(stage_fn, mesh: Mesh, n_stages: int,
                   with_ridx: bool = False):
    """returns f(stacked_params, x_micro) -> y_micro
    (or f(stacked_params, x_micro, ridx_base) when with_ridx)

    stacked_params: pytree with leading axis n_stages (sharded over 'pp')
    x_micro:        [n_micro, mb, ...] microbatched input (replicated)
    stage_fn(params_slice, x) -> x'   applied by each stage in turn

    with_ridx=True threads a per-(microbatch, stage) RNG index into the
    stage: stage_fn(params_slice, x, ridx) with
    ridx = ridx_base + micro_idx * n_stages + stage, so dropout layers
    inside a stage can draw masks that vary per microbatch, per stage
    and (via ridx_base) per batch/epoch — the nn.train key-derivation
    deviation extended to the pipeline (VERDICT r2 #6).
    """

    def _shmap_body(params, xs, ridx_base):
        # params: this device's stage slice [1, ...]; xs: all microbatches
        p = jax.tree.map(lambda a: a[0], params)
        stage = jax.lax.axis_index("pp")
        n_micro = xs.shape[0]
        T = n_micro + n_stages - 1
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(carry, t):
            acc, ys = carry
            # stage 0 ingests microbatch t (others use the permuted acc)
            x_in = jnp.where(stage == 0,
                             xs[jnp.minimum(t, n_micro - 1)], acc)
            mi = jnp.clip(t - stage, 0, n_micro - 1)   # my microbatch
            if with_ridx:
                y = stage_fn(p, x_in, ridx_base + mi * n_stages + stage)
            else:
                y = stage_fn(p, x_in)
            # active only while data is in this stage's window
            active = jnp.logical_and(t - stage >= 0, t - stage < n_micro)
            y = jnp.where(active, y, acc)
            # last stage banks finished microbatch t-(S-1)
            done = t - (n_stages - 1)
            ys = jax.lax.cond(
                jnp.logical_and(stage == n_stages - 1, done >= 0),
                lambda ys: jax.lax.dynamic_update_index_in_dim(
                    ys, y, jnp.maximum(done, 0), 0),
                lambda ys: ys, ys)
            nxt = jax.lax.ppermute(y, "pp", perm)
            return (nxt, ys), None

        acc0 = jnp.zeros_like(xs[0])
        ys0 = jnp.zeros_like(xs)
        (_, ys), _ = jax.lax.scan(tick, (acc0, ys0), jnp.arange(T))
        # the last stage holds the banked outputs; broadcast to all
        ys_all = jax.lax.all_gather(ys, "pp")            # [S, n_micro, ...]
        return ys_all[n_stages - 1]

    kwargs = dict(mesh=mesh, in_specs=(P("pp"), P(), P()), out_specs=P())
    try:
        fn = shard_map(_shmap_body, check_vma=False, **kwargs)
    except TypeError:                              # older jax
        fn = shard_map(_shmap_body, check_rep=False, **kwargs)
    if with_ridx:
        return lambda params, xs, ridx_base: fn(
            params, xs, jnp.asarray(ridx_base, jnp.int32))
    return lambda params, xs: fn(params, xs, jnp.int32(0))


def pipeline_loss_fn(stage_fn, head_fn, mesh, n_stages):
    """loss over a pipelined body + replicated head; differentiable"""
    pipe = pipeline_apply(stage_fn, mesh, n_stages)

    def loss(stacked_params, head_params, x_micro, y_micro):
        h = pipe(stacked_params, x_micro)
        return head_fn(head_params, h, y_micro)

    return loss


# ===========================================================================
# product path: `nn.pipe` word — train a repeated-block model over 'pp'
# ===========================================================================
def split_stages(program, params, stages: int):
    """(stem, block) split: program = stem ++ stages*block ++ head,
    where the `stages` body blocks are identical (same kinds/opts/param
    shapes).  stem/head replicate; the body pipelines over 'pp'.
    Raises if the model has no such structure."""
    L = len(program)
    for stem in range(0, L - stages + 1):
        best = 0
        for blk in range(1, (L - stem) // stages + 1):
            b = blk * stages
            ok = all(program[stem + i][:2]
                     == program[stem + i % blk][:2] for i in range(b))
            if ok:
                ok = all(tuple(w.shape for w in params[stem + i])
                         == tuple(w.shape for w in params[stem + i % blk])
                         for i in range(b))
            if ok:
                best = blk
        if best:
            return stem, best
    raise ValueError(
        f"nn.pipe: model body is not {stages} repeated blocks")


def _rebatch(spec, mb: int):
    kind, opts, shape = spec
    return (kind, opts, (mb,) + tuple(shape[1:]))


_Z1 = None


def make_wordpath_segment(seg_prog, key_base: int, tail: bool = False):
    """custom-vjp segment applier: forward chains funcs._apply_layer,
    backward applies the word-path per-layer rules (pass-through
    sigmoid/softmax/final-linear, masked activations — the reference's
    backprop.cu quirks) via funcs.backward_segment.  Differentiating a
    pipeline built from these segments therefore yields gradients
    IDENTICAL to the sequential word loop: scan/ppermute transposition
    provides the reverse GPipe schedule, the segment vjp provides the
    word-path math.  tail=True marks the segment that ends the network
    (enables the final-LINEAR pass-through quirk).

    The returned applier is apply(p, x, ridx): `ridx` (traced int32)
    selects the dropout key stream — fold_in(key0, ridx) then
    fold_in(key_base + layer) — so masks vary per microbatch/stage/
    batch/epoch while non-dropout layers ignore it entirely.  Its
    cotangent is float0 (dropout backward uses the saved mask, never
    the key)."""
    from ..nn import funcs
    global _Z1
    if _Z1 is None:
        _Z1 = jnp.zeros((1,), jnp.float32)
    key0 = jax.random.PRNGKey(0)

    def _run(p, x, ridx):
        kmb = jax.random.fold_in(key0, ridx)
        outs, masks = [], []
        xi = x
        for j, spec in enumerate(seg_prog):
            xi, m = funcs._apply_layer(
                spec, xi, p[j], jax.random.fold_in(kmb, key_base + j))
            xi = xi.reshape(spec[2])
            outs.append(xi)
            masks.append(m)
        return xi, tuple(outs), tuple(masks)

    @jax.custom_vjp
    def apply(p, x, ridx):
        return _run(p, x, ridx)[0]

    def fwd_rule(p, x, ridx):
        y, outs, masks = _run(p, x, ridx)
        return y, (p, x, outs, masks, ridx)

    def bwd_rule(res, dy):
        p, x, outs, masks, ridx = res
        dws0 = tuple(jnp.zeros_like(pl[0]) if pl else _Z1 for pl in p)
        dbs0 = tuple(jnp.zeros_like(pl[1]) if pl else _Z1 for pl in p)
        dx, _, dws, dbs = funcs.backward_segment(
            seg_prog, True, dy, x, outs, p, masks, dws0, dbs0, tail=tail)
        dp = tuple(
            (dws[j].reshape(p[j][0].shape), dbs[j].reshape(p[j][1].shape))
            if p[j] else () for j in range(len(p)))
        dridx = np.zeros(jnp.shape(ridx), dtype=jax.dtypes.float0)
        return dp, dx, dridx

    apply.defvjp(fwd_rule, bwd_rule)
    return apply


def train_pipeline(model, ds, lr: float, epochs: int, stages: int,
                   trace: int = 0) -> float:
    """fused pipeline-parallel training behind the `nn.pipe` word:
    the model's repeated body runs GPipe-style over a 'pp' mesh axis
    (microbatches circulate on ICI via ppermute), the head replicates.
    Gradients are WORD-PATH EXACT: every segment is a custom-vjp whose
    backward runs funcs.backward_segment (the reference's backprop.cu
    quirks), the loss cotangent is seeded as out-tgt (_bprep), and the
    update is the reference's uncorrected Adam — so given the same
    batches, nn.pipe reproduces the sequential `forward backprop
    nn.adam` loop bit-for-bit up to float reassociation.  Trained
    params are written back into the interpreter's model
    (table-driven)."""
    import numpy as np  # noqa: F401
    from ..nn import funcs
    from ..nn.train import (_stage_batches, write_back, ADAM_B1, ADAM_B2,
                            ADAM_EPS)

    import jax
    if jax.device_count() < stages:
        # without the guard the 1-device failure surfaces as a cryptic
        # ppermute uniqueness error from deep inside the stage shift
        raise ValueError(
            f"nn.pipe: {stages} pipeline stages need >= {stages} "
            f"devices, have {jax.device_count()} (set XLA_FLAGS="
            f"--xla_force_host_platform_device_count=N for a virtual "
            f"CPU mesh)")
    program = model._program()
    params = model._params()
    from ..nn.ntypes import Layer
    if any(kind == Layer.BATCHNM for kind, _o, _s in program):
        # PERMANENT exclusion: batch statistics would be computed per
        # MICRObatch, silently diverging from the sequential full-batch
        # semantics; cross-microbatch stat sync would serialize the
        # pipeline (each microbatch's normalize needs every other
        # microbatch's sums — the exact dependency pipelining removes).
        # Use layernorm in pipelined bodies.
        raise ValueError("nn.pipe: batchnorm layers are not supported "
                         "(per-microbatch stats would diverge; "
                         "use layernorm)")
    stem, blk = split_stages(program, params, stages)
    body_n = stem + blk * stages
    batch = model[0].N()
    n_micro = stages * 2 if batch % (stages * 2) == 0 else stages
    if batch % n_micro:
        raise ValueError(f"nn.pipe: batch {batch} not divisible into "
                         f"{n_micro} microbatches")
    mb = batch // n_micro

    stem_prog = tuple(program[:stem])
    block_prog = tuple(_rebatch(program[stem + i], mb) for i in range(blk))
    head_prog = tuple(program[body_n:])
    # stack per-stage params: [stages, ...] leaves, sharded over 'pp'
    stacked = tuple(
        tuple(jnp.stack([params[stem + s * blk + i][k]
                         for s in range(stages)])
              for k in range(len(params[stem + i])))
        for i in range(blk))
    stem_params = tuple(params[:stem])
    head_params = tuple(params[body_n:])

    mesh = make_pp_mesh(stages)
    psh = NamedSharding(mesh, P("pp"))
    stacked = jax.tree.map(lambda a: jax.device_put(a, psh), stacked)

    # key_base spacing keeps the stem/head dropout streams disjoint
    # from the block's (block uses 0..blk-1; guarded in split above)
    stem_apply = make_wordpath_segment(stem_prog, 500)
    block_apply = make_wordpath_segment(block_prog, 0)
    head_apply = make_wordpath_segment(head_prog, 99, tail=True)

    pipe = pipeline_apply(block_apply, mesh, stages, with_ridx=True)

    def fwd_all(st, sp, hp, x, ridx_base):
        h0 = stem_apply(sp, x, ridx_base)
        x_micro = h0.reshape((n_micro, mb) + tuple(h0.shape[1:]))
        h = pipe(st, x_micro, ridx_base)
        xh = h.reshape((batch,) + tuple(program[body_n - 1][2][1:]))
        return head_apply(hp, xh, ridx_base)

    final_fused = program[-1][0] in (Layer.LINEAR, Layer.SIGMOID,
                                     Layer.SOFTMAX, Layer.LOGSMAX)

    def batch_grads(st, sp, hp, x, hot, ridx_base):
        """loss + word-path gradients: jax.vjp over the pipelined
        network seeded with the reference's dLoss prep (out - tgt)"""
        out, vjp = jax.vjp(
            lambda st_, sp_, hp_: fwd_all(st_, sp_, hp_, x, ridx_base),
            st, sp, hp)
        n = out.shape[0]
        lval = -jnp.sum(hot.reshape(-1)
                        * jnp.log(jnp.maximum(out.reshape(-1),
                                              funcs.LN_CLAMP))) / n
        hotr = hot.reshape(out.shape)
        dy = out - hotr if final_fused else hotr
        gs, gp, gh = vjp(dy)
        return lval, gs, gp, gh

    lr_ = jnp.float32(lr)

    def adam(p, g, m, v):
        m = ADAM_B1 * m + (1.0 - ADAM_B1) * g
        v = ADAM_B2 * v + (1.0 - ADAM_B2) * g * g
        return p - lr_ * m / (jnp.sqrt(v) + ADAM_EPS), m, v

    x, y, n_batches = _stage_batches(ds, model)

    def zeros(t):
        return jax.tree.map(jnp.zeros_like, t)

    # tree.map(adam, ...) maps over 3 trees; restructure: run manually
    def adam_tree(p, g, m, v):
        flat_p, td = jax.tree.flatten(p)
        flat_g = jax.tree.leaves(g)
        flat_m = jax.tree.leaves(m)
        flat_v = jax.tree.leaves(v)
        out_p, out_m, out_v = [], [], []
        for pw, gw, mw, vw in zip(flat_p, flat_g, flat_m, flat_v):
            nw, nm, nv = adam(pw, gw, mw, vw)
            out_p.append(nw)
            out_m.append(nm)
            out_v.append(nv)
        return (jax.tree.unflatten(td, out_p),
                jax.tree.unflatten(td, out_m),
                jax.tree.unflatten(td, out_v))

    opt = (zeros(stacked), zeros(stacked),
           zeros(stem_params), zeros(stem_params),
           zeros(head_params), zeros(head_params))

    # ridx strides: each batch consumes n_micro*stages dropout-stream
    # slots (one per (microbatch, stage) pair); epochs don't overlap
    ridx_stride = n_micro * stages

    @jax.jit
    def epoch(stacked, stem_params, head_params, opt, xs, ys, ep_idx):
        def body(carry, xyb):
            st, sp, hp, (m1, v1, m0, v0, m2, v2) = carry
            x, hot, b = xyb
            ridx_base = (ep_idx * n_batches + b) * ridx_stride
            lval, gs, gp, gh = batch_grads(st, sp, hp, x, hot, ridx_base)
            st, m1, v1 = adam_tree(st, gs, m1, v1)
            sp, m0, v0 = adam_tree(sp, gp, m0, v0)
            hp, m2, v2 = adam_tree(hp, gh, m2, v2)
            return (st, sp, hp, (m1, v1, m0, v0, m2, v2)), lval
        (st, sp, hp, opt), ls = jax.lax.scan(
            body, (stacked, stem_params, head_params, opt),
            (xs, ys, jnp.arange(n_batches, dtype=jnp.int32)))
        return st, sp, hp, opt, ls.mean()

    lv = jnp.float32(0)
    for e in range(epochs):
        stacked, stem_params, head_params, opt, lv = epoch(
            stacked, stem_params, head_params, opt, x, y,
            jnp.int32(e))
        if trace:
            from ..system import System
            System.get_sys().pstr(
                f"\\   nn.pipe epoch {e}: {n_batches} batches over "
                f"pp{stages}, loss={float(lv):.6g}\n")
    loss = float(lv)

    # un-stack trained params back into the interpreter's model
    full = list(params)
    for j, sp in enumerate(stem_params):
        full[j] = sp
    for i in range(blk):
        for s in range(stages):
            full[stem + s * blk + i] = tuple(
                jax.device_get(stacked[i][k])[s]
                for k in range(len(stacked[i])))
    for j, hp in enumerate(head_params):
        full[body_n + j] = hp
    write_back(model, tuple(full))
    model.tick()
    model._iter += n_batches * epochs
    return loss


# ===========================================================================
# serving: steady-state streaming schedule (ROADMAP r2 item 4)
# ===========================================================================
def pipeline_serve(stage_fn, mesh: Mesh, n_stages: int):
    """Steady-state streaming inference over a request stream.

    `serve(stacked_params, reqs)` with reqs [R, n_micro, mb, ...]
    flattens all R requests into ONE continuous microbatch stream, so
    the pipeline's fill/drain bubble (S-1 ticks) is paid ONCE for the
    whole stream instead of once per request — the inference analog of
    a 1F1B steady state: R·n_micro + S - 1 ticks total versus
    fill-drain's R·(n_micro + S - 1).  At depth S=4 and n_micro=4 this
    is a 1.6x tick reduction on a saturated stream.
    """
    pipe = pipeline_apply(stage_fn, mesh, n_stages)

    def serve(stacked_params, reqs):
        r, nm = reqs.shape[0], reqs.shape[1]
        stream = reqs.reshape((r * nm,) + tuple(reqs.shape[2:]))
        ys = pipe(stacked_params, stream)
        return ys.reshape(reqs.shape[:2] + tuple(ys.shape[1:]))

    return serve


def pipeline_serve_filldrain(stage_fn, mesh: Mesh, n_stages: int):
    """Reference schedule for the serving benchmark: each request runs
    its own fill/drain pipeline pass (bubble per request) inside one
    compiled scan — what `nn.pipe`-style per-call dispatch would do."""
    pipe = pipeline_apply(stage_fn, mesh, n_stages)

    def serve(stacked_params, reqs):
        def one(_, req):
            return None, pipe(stacked_params, req)
        _, ys = jax.lax.scan(one, None, reqs)
        return ys

    return serve
