"""LM/serving tier: embedding + position-wise projection + per-position
softmax + KV-cache autoregressive generation (nn.gen)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_per_position_softmax_rows(t4):
    from tensorforth_tpu.nn import funcs
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 7, 1),
                    jnp.float32)
    y = np.asarray(funcs._softmax_fwd(x)).reshape(2, 5, 7)
    np.testing.assert_allclose(y.sum(-1), np.ones((2, 5)), rtol=1e-5)


def test_lm_forward_shapes(t4):
    from tensorforth_tpu.models import tiny_lm
    from tensorforth_tpu.nn import funcs
    m = tiny_lm(batch=2, seq=8, vocab=16, dim=16, heads=4, layers=1)
    ids = np.random.RandomState(1).randint(0, 16, (2, 8))
    x = jnp.asarray(ids.reshape(2, 8, 1, 1), jnp.float32)
    outs, _ = funcs.forward_pure(m._program(), x, m._params(),
                                 jax.random.PRNGKey(0))
    assert outs[-1].shape == (2, 8, 16, 1)
    probs = np.asarray(outs[-1]).reshape(2, 8, 16)
    np.testing.assert_allclose(probs.sum(-1), np.ones((2, 8)), rtol=1e-5)


def test_lm_word_path_memorizes(t4):
    """train a tiny LM on one fixed sequence batch via the word path"""
    from tensorforth_tpu.models import tiny_lm
    from tensorforth_tpu.mu.mmu import MMU
    mmu = MMU.get_mmu()
    m = tiny_lm(batch=2, seq=8, vocab=8, dim=16, heads=4, layers=1)
    rs = np.random.RandomState(3)
    ids = rs.randint(0, 8, (2, 8))
    tgt = np.roll(ids, -1, axis=1)           # next-token targets
    hot = np.eye(8, dtype=np.float32)[tgt].reshape(2, 8, 8, 1)

    inp = mmu.tensor(2, 8, 1, 1)
    inp.set_numpy(ids.reshape(2, 8, 1, 1).astype(np.float32))
    hott = mmu.tensor(2, 8, 8, 1)
    hott.set_numpy(hot)
    losses = []
    for _ in range(30):
        m.forward(inp)
        losses.append(m.loss(2, hott))       # CE
        m.backprop(hott)
        m.adam(0.01)
    assert losses[-1] < losses[0] * 0.5, f"LM not learning: {losses[:3]}...{losses[-3:]}"


def test_generate_cache_consistency(t4):
    """KV-cache decode must agree with full causal forward: every
    generated token is the argmax of the full-sequence logits at its
    position (teacher-forcing replay)"""
    from tensorforth_tpu.models import tiny_lm
    from tensorforth_tpu.nn import funcs
    from tensorforth_tpu.nn.serve import generate
    m = tiny_lm(batch=1, seq=12, vocab=16, dim=16, heads=4, layers=2)
    prompt = np.array([3, 1, 4, 1], np.int32)
    out = generate(m, prompt, n_new=8, temp=0.0)
    assert out.shape == (12,)
    np.testing.assert_array_equal(out[:4], prompt)

    # full forward over the generated sequence (batch must match model)
    x = jnp.asarray(out.reshape(1, 12, 1, 1), jnp.float32)
    outs, _ = funcs.forward_pure(m._program(), x, m._params(),
                                 jax.random.PRNGKey(0))
    probs = np.asarray(outs[-1]).reshape(12, 16)
    for t in range(3, 11):                   # decode region
        want = int(np.argmax(probs[t]))
        got = int(out[t + 1])
        assert got == want, f"cache/full divergence at position {t}"


def test_memorized_lm_generates_pattern(t4):
    """end-to-end: train on a repeating cycle, KV-cache decode must
    reproduce it exactly (the t4_53 demo's contract)"""
    from tensorforth_tpu.models import tiny_lm
    from tensorforth_tpu.mu.mmu import MMU
    from tensorforth_tpu.nn.serve import generate
    mmu = MMU.get_mmu()
    m = tiny_lm(batch=1, seq=8, vocab=4, dim=16, heads=2, layers=1)
    ids = np.array([[0, 1, 2, 3, 0, 1, 2, 3]])
    hot = np.eye(4, dtype=np.float32)[np.roll(ids, -1, 1)].reshape(1, 8, 4, 1)
    inp = mmu.tensor(1, 8, 1, 1)
    inp.set_numpy(ids.reshape(1, 8, 1, 1).astype(np.float32))
    ht = mmu.tensor(1, 8, 4, 1)
    ht.set_numpy(hot)
    for _ in range(100):
        m.forward(inp)
        m.backprop(ht)
        m.adam(0.01)
    out = generate(m, np.array([0, 1, 2, 3]), n_new=8, temp=0.0)
    want = np.array([0, 1, 2, 3] * 3)
    np.testing.assert_array_equal(out, want,
                                  err_msg=f"LM did not continue cycle: {out}")


def test_nn_gen_word(t4):
    """the .4th-level serving API"""
    out = t4.forth("""0 trace
1 12 1 1 nn.model
16 16 nn.embed layernorm 1 4 nn.attn tanh layernorm 16 nn.proj softmax
constant lmw
4 vector{ 3 1 4 1 } constant pr
lmw pr 8 nn.gen .""")
    rows = [l for l in out.split("\n") if "vector[12]" in l]
    assert rows, f"nn.gen produced no 12-token vector: {out[-400:]}"
    out2 = t4.forth("abort lmw 5 nn.gen")
    assert "nn.gen?" in out2                 # bad stack -> usage, alive


def test_lm_save_load_roundtrip(t4, tmp_path):
    p = tmp_path / "lm.t4"
    t4.forth("""0 trace
1 12 1 1 nn.model
16 16 nn.embed layernorm 1 4 nn.attn tanh layernorm 16 nn.proj softmax
constant svlm""")
    w0 = float(t4.forth("svlm 0 nn.w sum . cr drop").strip().split()[0])
    t4.forth(f'svlm s" {p}" save drop')
    out = t4.forth(f'1 12 1 1 nn.model constant ldlm\n'
                   f'ldlm s" {p}" load network')
    assert "embed" in out and "proj" in out
    w1 = float(t4.forth("0 nn.w sum . cr").strip().split()[0])
    assert abs(w0 - w1) < 1e-4


def test_nn_gen_batch_prompts(t4):
    """a matrix prompt [N, S0] decodes N sequences in one program"""
    out = t4.forth("""0 trace
2 12 1 1 nn.model
16 16 nn.embed layernorm 1 4 nn.attn tanh layernorm 16 nn.proj softmax
constant blm
2 4 matrix{ 3 1 4 1  2 7 1 8 } constant bpr
blm bpr 8 nn.gen .""")
    assert "matrix[2,12]" in out, f"batch decode failed: {out[-400:]}"


def test_generate_windowed_matches_baseline(t4):
    """windowed decode (power-of-two cache-prefix segments) and a
    bfloat16 KV cache must reproduce the baseline f32 full-cache
    greedy decode — windowing is exact (same math, smaller static
    slice); bf16 storage must not flip argmaxes on a confident
    model (serving-tier optimizations, VERDICT r4 next #7)"""
    import numpy as np
    from tensorforth_tpu.models import tiny_lm
    from tensorforth_tpu.nn.serve import generate
    m = tiny_lm(batch=1, seq=24, vocab=16, dim=16, heads=4, layers=2)
    prompt = np.array([3, 1, 4, 1], np.int32)
    base = generate(m, prompt, n_new=20, temp=0.0)
    # windowing is mathematically exact -> token-identical
    win = generate(m, prompt, n_new=20, temp=0.0, win=8)
    np.testing.assert_array_equal(base, win, "windowed decode diverged")
    # bf16 cache storage: same tokens on this model
    bf = generate(m, prompt, n_new=20, temp=0.0, kv_dtype="bfloat16")
    np.testing.assert_array_equal(base, bf, "bf16 cache flipped tokens")
    both = generate(m, prompt, n_new=20, temp=0.0, kv_dtype="bfloat16",
                    win=8)
    np.testing.assert_array_equal(base, both)


def test_generate_int8_kv_matches_baseline(t4):
    """int8 KV cache (symmetric per-vector scales, serve._quant8):
    quantization error ~0.4% RMS must not flip greedy argmaxes on
    this model — alone, with windows, and prefill vs sequential
    (both quantize stored KV the same way)"""
    import numpy as np
    from tensorforth_tpu.models import tiny_lm
    from tensorforth_tpu.nn.serve import generate
    m = tiny_lm(batch=1, seq=24, vocab=16, dim=16, heads=4, layers=2)
    prompt = np.array([3, 1, 4, 1], np.int32)
    base = generate(m, prompt, n_new=20, temp=0.0)
    q8 = generate(m, prompt, n_new=20, temp=0.0, kv_dtype="int8")
    np.testing.assert_array_equal(base, q8, "int8 cache flipped tokens")
    q8w = generate(m, prompt, n_new=20, temp=0.0, kv_dtype="int8", win=8)
    np.testing.assert_array_equal(base, q8w)
    seq = generate(m, prompt, n_new=20, temp=0.0, kv_dtype="int8",
                   prefill=False)
    np.testing.assert_array_equal(q8, seq,
                                  "int8 prefill/sequential diverged")


def test_prefill_matches_sequential(t4):
    """batched prefill (one causal forward filling the KV caches) must
    be token-identical to the sequential prompt replay for greedy
    decode — f32 exact; also under windows, bf16 cache, RoPE, and MoE
    models"""
    import numpy as np
    from tensorforth_tpu.models import tiny_lm
    from tensorforth_tpu.nn.serve import generate
    for rope in (False, True):
        m = tiny_lm(batch=1, seq=24, vocab=16, dim=16, heads=4,
                    layers=2, rope=rope)
        prompt = np.array([3, 1, 4, 1, 5, 9, 2, 6], np.int32)
        seq = generate(m, prompt, n_new=16, temp=0.0, prefill=False)
        pre = generate(m, prompt, n_new=16, temp=0.0, prefill=True)
        np.testing.assert_array_equal(seq, pre,
                                      f"prefill diverged (rope={rope})")
        both = generate(m, prompt, n_new=16, temp=0.0, prefill=True,
                        win=8, kv_dtype="bfloat16")
        np.testing.assert_array_equal(seq, both)


def test_prefill_moe_lm_matches_sequential(t4):
    """the _prefill MOE branch (expert FFN on the whole [N,S0,D]
    prompt) must agree with the per-token sequential routing"""
    import numpy as np
    from tensorforth_tpu.models.zoo import _new_model
    from tensorforth_tpu.nn.ntypes import Layer
    from tensorforth_tpu.nn.serve import generate
    m = _new_model(1, 24, 1, 1)
    m.add(Layer.EMBED, 16, 16.0)
    m.add(Layer.LNORM)
    m.add(Layer.ATTN, 4, 1.0)               # causal
    m.add(Layer.MOE, 4, 32.0, [2])          # 4 experts, top-2
    m.add(Layer.TANH)
    m.add(Layer.PROJ, 16)
    m.add(Layer.SOFTMAX)
    prompt = np.array([3, 1, 4, 1, 5, 9, 2, 6], np.int32)
    seq = generate(m, prompt, n_new=16, temp=0.0, prefill=False)
    pre = generate(m, prompt, n_new=16, temp=0.0, prefill=True)
    np.testing.assert_array_equal(seq, pre, "MoE prefill diverged")


def test_generate_n_new_zero(t4):
    """n_new=0 must return the prompt unchanged and not hang — the
    windowed path's first-segment doubling stalled forever at
    t0 == s_max (review finding, r5)"""
    import numpy as np
    from tensorforth_tpu.models import tiny_lm
    from tensorforth_tpu.nn.serve import generate
    m = tiny_lm(batch=1, seq=16, vocab=16, dim=16, heads=4, layers=1)
    prompt = np.arange(12, dtype=np.int32) % 16
    for win in (0, 8):
        out = generate(m, prompt, n_new=0, temp=0.0, win=win)
        np.testing.assert_array_equal(out, prompt)


def test_nn_train_zero_epochs(t4):
    """`0 nn.train` must be a no-op, not an UnboundLocalError (review
    finding, r5)"""
    from tensorforth_tpu.models import mnist_cnn
    from tensorforth_tpu.nn.train import train_epochs
    m = mnist_cnn(batch=10)
    assert train_epochs(m, None, epochs=0) == 0.0


@pytest.mark.parametrize("spec", ["dp2", "dp2,tp2"])
def test_generate_mesh_sharded_matches_single_device(t4, monkeypatch,
                                                     spec):
    """T4_MESH engages the serving tier (serve._shard_serving): batch
    over 'dp', heads over 'tp', KV caches split [N/dp, h/tp, S, dh].
    Greedy tokens must be identical to the single-device program —
    same ops, different layout — for f32, bf16 and int8 caches, with
    windows, and through the batched prefill."""
    import numpy as np
    from tensorforth_tpu.models import tiny_lm
    from tensorforth_tpu.nn import funcs
    from tensorforth_tpu.nn.serve import generate
    m = tiny_lm(batch=4, seq=24, vocab=16, dim=16, heads=4, layers=2,
                rope=True)
    rs = np.random.RandomState(3)
    prompt = rs.randint(0, 16, (4, 6)).astype(np.int32)
    monkeypatch.delenv("T4_MESH", raising=False)
    base = generate(m, prompt, n_new=16, temp=0.0)
    base_q8 = generate(m, prompt, n_new=16, temp=0.0, kv_dtype="int8",
                       win=8)
    monkeypatch.setenv("T4_MESH", spec)
    assert funcs.word_mesh() is not None, "mesh did not build"
    sharded = generate(m, prompt, n_new=16, temp=0.0)
    np.testing.assert_array_equal(base, sharded,
                                  f"{spec} flipped greedy tokens")
    sh_q8 = generate(m, prompt, n_new=16, temp=0.0, kv_dtype="int8",
                     win=8)
    np.testing.assert_array_equal(base_q8, sh_q8)


def test_generate_mesh_degrades_on_indivisible(t4, monkeypatch):
    """batch or heads not dividing the mesh -> silently single-device
    (a laptop run with a pod T4_MESH must still serve)"""
    import numpy as np
    from tensorforth_tpu.models import tiny_lm
    from tensorforth_tpu.nn.serve import generate
    m = tiny_lm(batch=3, seq=16, vocab=16, dim=16, heads=4, layers=1)
    prompt = np.array([[1, 2, 3]], np.int32).repeat(3, 0)
    monkeypatch.delenv("T4_MESH", raising=False)
    base = generate(m, prompt, n_new=8, temp=0.0)
    monkeypatch.setenv("T4_MESH", "dp2")     # batch 3 % dp 2 != 0
    out = generate(m, prompt, n_new=8, temp=0.0)
    np.testing.assert_array_equal(base, out)
