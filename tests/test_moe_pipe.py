"""MoE layer (nn.moe) + pipeline training (nn.pipe) — the script-level
pp/ep product paths (VERDICT r1 missing #5 / next-round #7)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


class _Corpus:
    def __init__(self, data, labels):
        self._d, self._l = data, labels
        self.size = data.shape[0]

    def _read(self, s, n):
        return self._d[s:s + n], self._l[s:s + n]


class _DS:
    def __init__(self, data, labels, batch):
        self._corpus = _Corpus(data, labels)
        self.batch_sz = batch
        self._mean, self._scale = 0.0, 1.0


def _snapshot(model):
    return [tuple(np.array(w, np.float32) for w in pl)
            for pl in model._params()]


def _restore(model, snap):
    for j in range(model.numel - 1):
        t_in = model[j]
        for k, w in enumerate(snap[j]):
            g = t_in.grad[k]
            g.replace_data(np.asarray(w, np.float32).reshape(g.shape))


def test_moe_word_builds_and_learns(t4):
    """nn.moe through the full word path: forward/backprop/nn.adam"""
    out = t4.forth("""0 trace
4 8 16 1 nn.model
2 32 4 nn.moe tanh flatten 4 linear softmax
constant mo
mo network""")
    assert "moe" in out
    t4.forth("512 vector randn 4 8 16 1 reshape4 constant xv")
    t4.forth("mo xv forward")
    t4.forth("16 vector{ 1 0 0 0  1 0 0 0  1 0 0 0  1 0 0 0 } "
             "4 1 4 1 reshape4 nn.onehot= drop")
    losses = []
    for _ in range(12):
        out = t4.forth(
            "mo xv forward loss.ce . backprop 0.005 nn.adam drop")
        losses.append(float(out.strip().split()[0]))
    assert losses[-1] < losses[0] * 0.7, f"moe not learning: {losses}"


def test_moe_word_stack_error(t4):
    out = t4.forth("nn.moe")
    assert "nn.moe" in out


@needs_mesh
def test_moe_expert_parallel_matches_replicated(t4, monkeypatch):
    """nn.train under T4_MESH=dp2,ep4 must land the same weights as the
    unsharded run (expert parallelism is a layout, not a math change)"""
    monkeypatch.delenv("T4_MAX_BATCH", raising=False)
    from tensorforth_tpu.models import tiny_moe
    from tensorforth_tpu.nn.train import train_epochs

    rs = np.random.RandomState(0)
    data = rs.rand(16, 8, 16, 1).astype(np.float32)
    labels = rs.randint(0, 4, 16)

    a = tiny_moe(batch=8)
    b = tiny_moe(batch=8)
    p0 = _snapshot(a)
    _restore(b, p0)

    monkeypatch.delenv("T4_MESH", raising=False)
    la = train_epochs(a, _DS(data, labels, 8), lr=0.01, epochs=2)
    monkeypatch.setenv("T4_MESH", "dp2,ep4")
    lb = train_epochs(b, _DS(data, labels, 8), lr=0.01, epochs=2)

    np.testing.assert_allclose(la, lb, rtol=1e-4)
    pa, pb = _snapshot(a), _snapshot(b)
    changed = False
    for j, (x, y) in enumerate(zip(pa, pb)):
        for k, (w1, w2) in enumerate(zip(x, y)):
            np.testing.assert_allclose(
                w1, w2, rtol=2e-4, atol=2e-5,
                err_msg=f"layer {j} param {k}: ep-sharded != replicated")
            if not np.allclose(w1, p0[j][k]):
                changed = True
    assert changed


@needs_mesh
def test_nn_pipe_matches_sequential(t4, monkeypatch):
    """train_pipeline (the nn.pipe word's engine) must reproduce the
    WORD PATH exactly: same gradients as funcs.backward_pure (reference
    backprop.cu quirks incl. the out-tgt dLoss prep and pass-through
    softmax) and the reference's uncorrected Adam — i.e. the same step
    nn.train takes, which test_train_equiv pins to the word loop"""
    monkeypatch.delenv("T4_MAX_BATCH", raising=False)
    from tensorforth_tpu.models import tiny_transformer
    from tensorforth_tpu.nn.train import make_ref_batch_step
    from tensorforth_tpu.parallel.pipeline import train_pipeline

    rs = np.random.RandomState(1)
    data = rs.rand(8, 8, 16, 1).astype(np.float32)
    labels = rs.randint(0, 4, 8)
    hot = np.eye(4, dtype=np.float32)[labels].reshape(8, 1, 4, 1)

    a = tiny_transformer(batch=8, seq=8, dim=16, heads=4, classes=4,
                         layers=4)
    b = tiny_transformer(batch=8, seq=8, dim=16, heads=4, classes=4,
                         layers=4)
    p0 = _snapshot(a)
    _restore(b, p0)

    lr = 0.01
    lp = train_pipeline(a, _DS(data, labels, 8), lr=lr, epochs=1, stages=4)

    # word-path comparator: the exact step the sequential word loop takes
    program = b._program()
    params = b._params()
    step = make_ref_batch_step(program, lr)
    zm = tuple(tuple(jnp.zeros_like(w) for w in pl) for pl in params)
    zv = tuple(tuple(jnp.zeros_like(w) for w in pl) for pl in params)
    new_p, _m, _v, lval = step(params, zm, zv, jnp.asarray(data),
                               jnp.asarray(hot), jax.random.PRNGKey(0))

    np.testing.assert_allclose(lp, float(lval), rtol=1e-4)
    pa = _snapshot(a)
    for j, (got, want) in enumerate(zip(pa, new_p)):
        for k, (w1, w2) in enumerate(zip(got, want)):
            np.testing.assert_allclose(
                w1, np.asarray(w2), rtol=1e-4, atol=1e-5,
                err_msg=f"layer {j} param {k}: pipelined != word path")


@needs_mesh
def test_nn_pipe_word(t4, monkeypatch):
    """the .4th-level API end-to-end: a stem + repeated-linear-block
    model trains over pp2 straight from Forth words on the dataset"""
    monkeypatch.setenv("T4_MAX_BATCH", "3")
    t4.forth("""0 trace
16 28 28 1 nn.model
flatten 64 linear relu 64 linear relu 64 linear relu 10 linear softmax
constant pmdl
pmdl batchsize dataset mnist_train constant pds""")
    before = float(t4.forth("pmdl 1 nn.w sum . cr").strip().split()[0])
    out = t4.forth("pmdl pds 0.005 2 2 nn.pipe")
    assert "nn.pipe 2 epochs over pp2 done" in out
    after = float(t4.forth("1 nn.w sum . cr").strip().split()[0])
    assert before != after, "pipeline training did not write back weights"
    out = t4.forth("abort pmdl 0.01 1 4 nn.pipe")
    assert "nn.pipe?" in out    # missing dataset -> usage error, REPL alive


def test_attn_moe_save_load_roundtrip(t4, tmp_path):
    """save/load must persist attention and MoE layers + params
    (the r1 silent-loss class extended to the new layer kinds)"""
    p = tmp_path / "tm.t4"
    t4.forth("""0 trace
4 8 16 1 nn.model
4 nn.attn 2 32 4 nn.moe tanh flatten 4 linear softmax
constant svm""")
    w0 = float(t4.forth("svm 0 nn.w sum . cr drop").strip().split()[0])
    m0 = float(t4.forth("svm 1 nn.w sum . cr drop").strip().split()[0])
    t4.forth(f's" {p}" svm swap save drop' if False
             else f'svm s" {p}" save drop')
    out = t4.forth(f"""4 8 16 1 nn.model constant ldm
ldm s" {p}" load network""")
    assert "attn" in out and "moe" in out, f"layers not rebuilt: {out}"
    w1 = float(t4.forth("ldm 0 nn.w sum . cr drop").strip().split()[0])
    m1 = float(t4.forth("ldm 1 nn.w sum . cr drop").strip().split()[0])
    assert abs(w0 - w1) < 1e-4, "attention params not persisted"
    assert abs(m0 - m1) < 1e-4, "moe params not persisted"


def test_layernorm_word_trains_and_persists(t4, tmp_path):
    """layernorm layer: word-path training + save/load roundtrip"""
    p = tmp_path / "ln.t4"
    t4.forth("""0 trace
4 8 16 1 nn.model
layernorm 4 nn.attn layernorm flatten 4 linear softmax
constant lnm""")
    t4.forth("512 vector randn 4 8 16 1 reshape4 constant lx")
    t4.forth("lnm lx forward")
    t4.forth("16 vector{ 1 0 0 0  1 0 0 0  1 0 0 0  1 0 0 0 } "
             "4 1 4 1 reshape4 nn.onehot= drop")
    losses = []
    for _ in range(10):
        out = t4.forth("lnm lx forward loss.ce . backprop 0.01 nn.adam drop")
        losses.append(float(out.strip().split()[0]))
    assert losses[-1] < losses[0], f"lnorm model not learning: {losses}"
    g0 = float(t4.forth("lnm 0 nn.w sum . cr drop").strip().split()[0])
    assert abs(g0 - 16.0) > 1e-4, "gamma never trained"
    t4.forth(f'lnm s" {p}" save drop')
    out = t4.forth(f'4 8 16 1 nn.model constant ll\nll s" {p}" load network')
    assert "lnorm" in out
    g1 = float(t4.forth("0 nn.w sum . cr").strip().split()[0])
    assert abs(g0 - g1) < 1e-4, "gamma not persisted"


def test_split_stages_rejects_non_repeated(t4):
    from tensorforth_tpu.models import mnist_cnn
    from tensorforth_tpu.parallel.pipeline import split_stages
    m = mnist_cnn(batch=8)
    with pytest.raises(ValueError):
        split_stages(m._program(), m._params(), 4)


def test_optimizer_state_resume(t4, tmp_path):
    """save/load with optimizer state: resuming adam training after a
    roundtrip must follow the SAME trajectory as never stopping (the
    reference loses m/v on save — SURVEY §5 — so its resumes restart
    the optimizer cold)"""
    p = tmp_path / "resume.t4"
    t4.forth("""0 trace
4 1 8 1 nn.model 16 linear relu 4 linear softmax constant rsm
32 vector randn 4 1 8 1 reshape4 constant rsx
16 vector{ 1 0 0 0  0 1 0 0  0 0 1 0  0 0 0 1 } 4 1 4 1 reshape4
constant rsh
rsm rsx forward rsh nn.onehot= drop
: rstp rsm rsx forward rsh backprop 0.01 nn.adam drop ;""")
    for _ in range(6):
        t4.forth("rstp")
    t4.forth(f'rsm s" {p}" save drop')
    # continuous run: 4 more steps without interruption
    for _ in range(4):
        t4.forth("rstp")
    w_cont = float(t4.forth("rsm 0 nn.w sum . cr drop").strip().split()[0])

    # resumed run: fresh model, load (params + m/v + iter), 4 steps
    t4.forth(f'4 1 8 1 nn.model constant rld2\nrld2 s" {p}" load')
    from tensorforth_tpu.mu.mmu import MMU
    models = [o for o in MMU.get_mmu()._objs.values()
              if getattr(o, "is_model", lambda: False)()]
    lm = models[-1]
    assert lm._opt_inited, "optimizer state not restored"
    assert lm._iter == 6
    t4.forth(""": rstp2 rld2 rsx forward rsh backprop 0.01 nn.adam drop ;""")
    for _ in range(4):
        t4.forth("rstp2")
    w_res = float(t4.forth("rld2 0 nn.w sum . cr drop").strip().split()[0])
    assert abs(w_cont - w_res) < 1e-4, \
        f"resume diverged: continuous {w_cont} vs resumed {w_res}"


def test_optimizer_state_resume_sgdm(t4, tmp_path):
    """momentum-SGD state also persists (kind=1 sections)"""
    p = tmp_path / "resume_sgdm.t4"
    t4.forth("""0 trace
4 1 8 1 nn.model 8 linear relu 4 linear softmax constant sgm
32 vector randn 4 1 8 1 reshape4 constant sgx
16 vector{ 1 0 0 0  0 1 0 0  0 0 1 0  0 0 0 1 } 4 1 4 1 reshape4
constant sgh
sgm sgx forward sgh nn.onehot= drop
: sstp sgm sgx forward sgh backprop 0.9 0.05 nn.sgd drop ;""")
    for _ in range(5):
        t4.forth("sstp")
    t4.forth(f'sgm s" {p}" save drop')
    raw = open(p, "rb").read() if False else open(str(p), "rb").read()
    assert b"--- opt.meta" in raw and b"--- om.0" in raw, \
        "momentum sections missing from the checkpoint"
    assert b"--- ov.0" not in raw          # kind 1: no velocity
    for _ in range(3):
        t4.forth("sstp")
    w_cont = float(t4.forth("sgm 0 nn.w sum . cr drop").strip().split()[0])
    t4.forth(f'4 1 8 1 nn.model constant sgl\nsgl s" {p}" load')
    t4.forth(": sstp2 sgl sgx forward sgh backprop 0.9 0.05 nn.sgd drop ;")
    for _ in range(3):
        t4.forth("sstp2")
    w_res = float(t4.forth("sgl 0 nn.w sum . cr drop").strip().split()[0])
    assert abs(w_cont - w_res) < 1e-4, \
        f"sgdm resume diverged: {w_cont} vs {w_res}"


# ---------------------------------------------------------------------------
# token-dispatch MoE (VERDICT r2 #5): real top-k routing with capacity
# buffers + scatter/gather, cost scaling with k/E instead of E
# ---------------------------------------------------------------------------

def _moe_rand(seed, n=4, t=16, d=8, e=4, f=16):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(n, t, d).astype(np.float32))
    wr = jnp.asarray(rs.randn(e, d).astype(np.float32) * 0.3)
    w1 = jnp.asarray(rs.randn(e, d, f).astype(np.float32) * 0.2)
    w2 = jnp.asarray(rs.randn(e, f, d).astype(np.float32) * 0.2)
    return x, wr, w1, w2


def test_moe_dispatch_matches_soft_when_undropped():
    """with capacity >= any expert's real load the dispatch path is
    the same math as the soft path (top-k renormalized gates)"""
    from tensorforth_tpu.parallel.moe import moe_fwd, moe_fwd_dispatch
    x, wr, w1, w2 = _moe_rand(0)
    e, k = w1.shape[0], 2
    soft = moe_fwd(x, wr, w1, w2, top_k=k)
    # cf = E/k makes cap = S, so no expert can overflow
    disp = moe_fwd_dispatch(x, wr, w1, w2, top_k=k,
                            capacity_factor=float(e) / k)
    np.testing.assert_allclose(np.asarray(disp), np.asarray(soft),
                               rtol=2e-5, atol=2e-5)


def test_moe_dispatch_grads_match_soft():
    from tensorforth_tpu.parallel.moe import moe_fwd, moe_fwd_dispatch
    x, wr, w1, w2 = _moe_rand(1)
    e, k = w1.shape[0], 2

    def loss_soft(x, wr, w1, w2):
        return jnp.sum(moe_fwd(x, wr, w1, w2, top_k=k) ** 2)

    def loss_disp(x, wr, w1, w2):
        return jnp.sum(moe_fwd_dispatch(x, wr, w1, w2, top_k=k,
                                        capacity_factor=float(e) / k) ** 2)

    gs = jax.grad(loss_soft, argnums=(0, 1, 2, 3))(x, wr, w1, w2)
    gd = jax.grad(loss_disp, argnums=(0, 1, 2, 3))(x, wr, w1, w2)
    for a, b in zip(gs, gd):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-4, atol=3e-4)


def test_moe_dispatch_capacity_drops_tokens():
    """overflowed assignments must contribute exactly zero, not be
    clamped into slot C-1 (scatter mode='drop' contract)"""
    from tensorforth_tpu.parallel.moe import moe_fwd_dispatch
    x, _, w1, w2 = _moe_rand(2)
    x = jnp.abs(x) + 0.1                 # positive sums: router below is
    e, d = w1.shape[0], w1.shape[1]      # then unambiguous for every token
    # router that sends EVERY token to expert 0
    wr = jnp.zeros((e, d), jnp.float32).at[0].set(100.0)
    y = moe_fwd_dispatch(x, wr, w1, w2, top_k=1, capacity_factor=0.25)
    s = x.shape[0] * x.shape[1]
    cap = int(np.ceil(s / e * 0.25))
    yt = np.asarray(y).reshape(s, -1)
    # first `cap` tokens served, the rest dropped to zero
    assert np.all(np.abs(yt[cap:]) == 0.0), "overflow tokens not dropped"
    assert np.any(yt[:cap] != 0.0)


def test_moe_dispatch_flops_scale_with_k_over_e():
    """the whole point: a k=1-of-4 dispatch step must cost ~1/4 the
    dense einsum's expert FLOPs (VERDICT r2 #5 'FLOP-count assertion')"""
    from tensorforth_tpu.parallel.moe import moe_fwd, moe_fwd_dispatch
    x, wr, w1, w2 = _moe_rand(3, n=8, t=32, d=32, e=4, f=64)

    def fl(fn):
        c = jax.jit(fn).lower(x, wr, w1, w2).compile().cost_analysis()
        c = c[0] if isinstance(c, (list, tuple)) else c
        return float(c["flops"])

    dense = fl(lambda *a: moe_fwd(*a, top_k=1))
    disp = fl(lambda *a: moe_fwd_dispatch(*a, top_k=1,
                                          capacity_factor=1.0))
    # expert matmuls dominate; router/gather overheads allow slack
    assert disp < 0.45 * dense, \
        f"dispatch not cheaper: {disp:.0f} vs dense {dense:.0f}"


def test_moe_select_static_rules(monkeypatch):
    from tensorforth_tpu.parallel.moe import moe_select
    monkeypatch.delenv("T4_MOE_DISPATCH", raising=False)
    assert not moe_select((4, 8), 4, 2)          # 32 tokens: too small
    assert moe_select((8, 64), 8, 2)             # 512 tokens, k*cf << E
    assert not moe_select((8, 64), 4, 2)         # k=2,cf1.25 > E/2
    monkeypatch.setenv("T4_MOE_DISPATCH", "1")
    assert moe_select((1, 1), 2, 2)
    monkeypatch.setenv("T4_MOE_DISPATCH", "0")
    assert not moe_select((8, 64), 8, 2)


@needs_mesh
def test_moe_dispatch_ep_sharded_matches_replicated():
    """the dispatch path under an ep-sharded mesh must produce the
    replicated result (scatter/gather become XLA all-to-alls)"""
    from tensorforth_tpu.parallel.moe import (moe_fwd_dispatch,
                                              make_ep_mesh, shard_experts)
    x, wr, w1, w2 = _moe_rand(4, n=8, t=32, d=16, e=8, f=32)
    k = 2
    ref = moe_fwd_dispatch(x, wr, w1, w2, top_k=k, capacity_factor=2.0)
    mesh = make_ep_mesh(8)
    wr_s, w1_s, w2_s = shard_experts(mesh, wr, w1, w2)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") \
            else mesh:
        out = jax.jit(lambda *a: moe_fwd_dispatch(*a, top_k=k,
                                                  capacity_factor=2.0))(
            x, wr_s, w1_s, w2_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# nn.pipe dropout support + steady-state serving schedule (VERDICT r2 #6)
# ---------------------------------------------------------------------------

@needs_mesh
def test_pipe_segment_dropout_varies_with_ridx():
    """the documented RNG deviation, pinned: dropout masks inside a
    pipeline segment derive from the traced ridx — same ridx => same
    mask (determinism), different ridx => different mask (not the
    frozen-mask failure the old refusal guarded against)"""
    from tensorforth_tpu.models import mnist_cnn  # noqa: F401 (env init)
    from tensorforth_tpu.parallel.pipeline import make_wordpath_segment
    from tensorforth_tpu.nn.ntypes import Layer

    prog = ((Layer.DROPOUT, (0.5,), (4, 16)),)
    seg = make_wordpath_segment(prog, 0)
    p = ((),)
    x = jnp.ones((4, 16), jnp.float32)
    y0 = np.asarray(seg(p, x, jnp.int32(0)))
    y0b = np.asarray(seg(p, x, jnp.int32(0)))
    y1 = np.asarray(seg(p, x, jnp.int32(1)))
    np.testing.assert_array_equal(y0, y0b)
    assert np.any(y0 != y1), "dropout mask frozen across ridx"


@needs_mesh
def test_nn_pipe_dropout_trains(t4, monkeypatch):
    """a dropout model now trains through nn.pipe (old behavior was a
    refusal); loss decreases and dropout actually drops (masks differ
    across batches via ridx_base)"""
    monkeypatch.setenv("T4_MAX_BATCH", "3")
    t4.forth("""0 trace
16 28 28 1 nn.model
flatten 64 linear relu
64 linear relu 0.3 dropout 64 linear relu 0.3 dropout
10 linear softmax
constant dpm
dpm batchsize dataset mnist_train constant dpd""")
    before = float(t4.forth("dpm 1 nn.w sum . cr").strip().split()[0])
    out = t4.forth("dpm dpd 0.005 2 2 nn.pipe")
    assert "nn.pipe 2 epochs over pp2 done" in out, out[-300:]
    after = float(t4.forth("dpm 1 nn.w sum . cr").strip().split()[0])
    assert after != before, "weights unchanged through dropout nn.pipe"


@needs_mesh
def test_nn_pipe_batchnorm_still_refused(t4, monkeypatch):
    """batchnorm stays a documented permanent exclusion (per-microbatch
    stats would silently diverge)"""
    monkeypatch.setenv("T4_MAX_BATCH", "3")
    t4.forth("""0 trace
16 28 28 1 nn.model
flatten 64 linear 0.1 batchnorm relu 64 linear 0.1 batchnorm relu
10 linear softmax
constant bnm
bnm batchsize dataset mnist_train constant bnd""")
    out = t4.forth("bnm bnd 0.005 1 2 nn.pipe")
    assert "batchnorm" in out and "ERROR" in out.upper() or \
           "not supported" in out, out[-300:]


@needs_mesh
def test_pipeline_serve_steady_state_beats_filldrain():
    """serving benchmark (VERDICT r2 #6): one continuous stream pays
    the S-1 bubble once; per-request fill-drain pays it R times. At
    depth 4, nm=4, R=8: 35 vs 56 ticks -> expect a solid wall-clock win
    with a compute-bound stage"""
    import time
    from tensorforth_tpu.parallel.pipeline import (
        make_pp_mesh, pipeline_serve, pipeline_serve_filldrain)

    S, R, NM, D = 4, 8, 4, 256
    mesh = make_pp_mesh(S)
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(S, D, D).astype(np.float32) * 0.05)
    reqs = jnp.asarray(rs.randn(R, NM, 8, D).astype(np.float32))

    def stage(p, x):
        return jnp.tanh(x @ p)

    stream = jax.jit(pipeline_serve(stage, mesh, S))
    fd = jax.jit(pipeline_serve_filldrain(stage, mesh, S))

    ys = stream(w, reqs)
    yf = fd(w, reqs)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(yf),
                               rtol=1e-5, atol=1e-5)

    def best(fn, n=5):
        t = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(w, reqs))
            t.append(time.perf_counter() - t0)
        return min(t)

    # ticks: R*NM+S-1=35 vs R*(NM+S-1)=56 -> 1.6x; CPU-mesh noise margin.
    # Wall-clock on the shared 1-core host is noisy when other suites /
    # background jobs run — retry the comparison before declaring a
    # scheduling regression (r4: observed flaking only under external
    # host load; passes in 3s in isolation)
    for attempt in range(3):
        ts, tf = best(stream), best(fd)
        if ts < tf * 0.92:
            break
    else:
        raise AssertionError(
            f"steady-state not faster: {ts * 1e3:.2f} vs {tf * 1e3:.2f} ms")
