"""RoPE attention flags + sampling (top-k / nucleus top-p) for the
LM/serving tier."""
import numpy as np
import jax
import jax.numpy as jnp


def test_rope_identity_at_pos0(t4):
    from tensorforth_tpu.nn import funcs
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 1, 8),
                    jnp.float32)
    y = funcs.rope_apply(x, jnp.zeros(1, jnp.int32))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_rope_relative_dot_products(t4):
    """RoPE's defining property: q(pos+d) . k(pos+d) depends only on d,
    not on the absolute position"""
    from tensorforth_tpu.nn import funcs
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randn(1, 1, 1, 16), jnp.float32)
    k = jnp.asarray(rs.randn(1, 1, 1, 16), jnp.float32)

    def score(pq, pk):
        qq = funcs.rope_apply(q, jnp.asarray([pq]))
        kk = funcs.rope_apply(k, jnp.asarray([pk]))
        return float(jnp.sum(qq * kk))

    assert abs(score(0, 3) - score(5, 8)) < 1e-4
    assert abs(score(2, 2) - score(9, 9)) < 1e-4
    assert abs(score(0, 3) - score(0, 4)) > 1e-6   # sanity: d matters


def test_rope_attn_word_and_shapes(t4):
    out = t4.forth("""0 trace
2 8 16 1 nn.model 3 4 nn.attn softmax constant rma
rma network""")
    assert "attn" in out
    from tensorforth_tpu.mu.mmu import MMU
    # the flags land in xparm (bit0 causal, bit1 rope)
    import tensorforth_tpu.system as S
    m = None
    for oid, obj in MMU.get_mmu()._objs.items():
        if getattr(obj, "is_model", lambda: False)():
            m = obj
    assert m is not None
    assert int(float(m[0].xparm)) == 3
    prog = m._program()
    assert prog[0][1] == (4, True, True)      # heads, causal, rope


def test_rope_odd_head_dim_rejected(t4):
    out = t4.forth("0 trace 1 4 6 1 nn.model 2 2 nn.attn")
    assert "even head dim" in out


def test_rope_lm_trains_and_decodes_consistently(t4):
    """RoPE LM: KV-cache decode (rotations applied at traced position t)
    must agree with the full-sequence forward"""
    from tensorforth_tpu.models import tiny_lm
    from tensorforth_tpu.nn import funcs
    from tensorforth_tpu.nn.serve import generate
    from tensorforth_tpu.mu.mmu import MMU
    mmu = MMU.get_mmu()
    m = tiny_lm(batch=1, seq=12, vocab=16, dim=16, heads=4, layers=2,
                rope=True)
    prompt = np.array([3, 1, 4, 1], np.int32)
    out = generate(m, prompt, n_new=8, temp=0.0)
    assert out.shape == (12,)
    x = jnp.asarray(out.reshape(1, 12, 1, 1), jnp.float32)
    outs, _ = funcs.forward_pure(m._program(), x, m._params(),
                                 jax.random.PRNGKey(0))
    probs = np.asarray(outs[-1]).reshape(12, 16)
    for t in range(3, 11):
        assert int(out[t + 1]) == int(np.argmax(probs[t])), \
            f"rope cache/full divergence at {t}"

    # and it learns through the word-path training loop
    ids = np.array([[0, 1, 2, 3, 0, 1, 2, 3, 0, 1, 2, 3]])
    hot = np.eye(16, dtype=np.float32)[np.roll(ids, -1, 1)]
    inp = mmu.tensor(1, 12, 1, 1)
    inp.set_numpy(ids.reshape(1, 12, 1, 1).astype(np.float32))
    ht = mmu.tensor(1, 12, 16, 1)
    ht.set_numpy(hot.reshape(1, 12, 16, 1))
    losses = []
    for _ in range(30):
        m.forward(inp)
        losses.append(m.loss(2, ht))
        m.backprop(ht)
        m.adam(0.01)
    assert losses[-1] < losses[0] * 0.5, f"rope LM not learning: {losses[0]} -> {losses[-1]}"


def test_topk1_equals_greedy(t4):
    from tensorforth_tpu.models import tiny_lm
    from tensorforth_tpu.nn.serve import generate
    m = tiny_lm(batch=1, seq=10, vocab=16, dim=16, heads=4, layers=1)
    prompt = np.array([2, 7], np.int32)
    greedy = generate(m, prompt, n_new=8, temp=0.0)
    topk1 = generate(m, prompt, n_new=8, temp=0.7, top_k=1, seed=9)
    np.testing.assert_array_equal(greedy, topk1)


def test_topp_tiny_equals_greedy(t4):
    from tensorforth_tpu.models import tiny_lm
    from tensorforth_tpu.nn.serve import generate
    m = tiny_lm(batch=1, seq=10, vocab=16, dim=16, heads=4, layers=1)
    prompt = np.array([5], np.int32)
    greedy = generate(m, prompt, n_new=9, temp=0.0)
    nucleus = generate(m, prompt, n_new=9, temp=1.3, top_p=1e-6, seed=4)
    np.testing.assert_array_equal(greedy, nucleus)


def test_topk_restricts_support(t4):
    """with top_k=2 every sampled token must be one of the two
    highest-probability tokens of the full forward at its position"""
    from tensorforth_tpu.models import tiny_lm
    from tensorforth_tpu.nn import funcs
    from tensorforth_tpu.nn.serve import generate
    m = tiny_lm(batch=1, seq=12, vocab=16, dim=16, heads=4, layers=1)
    prompt = np.array([1, 2, 3], np.int32)
    out = generate(m, prompt, n_new=9, temp=2.0, top_k=2, seed=11)
    x = jnp.asarray(out.reshape(1, 12, 1, 1), jnp.float32)
    outs, _ = funcs.forward_pure(m._program(), x, m._params(),
                                 jax.random.PRNGKey(0))
    probs = np.asarray(outs[-1]).reshape(12, 16)
    for t in range(2, 11):
        top2 = set(np.argsort(probs[t])[-2:].tolist())
        assert int(out[t + 1]) in top2, \
            f"top_k=2 violated at {t}: {out[t + 1]} not in {top2}"


def test_nn_gen_word_sampling_forms(t4):
    out = t4.forth("""0 trace
1 12 1 1 nn.model
16 16 nn.embed layernorm 3 4 nn.attn tanh layernorm 16 nn.proj softmax
constant slm
4 vector{ 3 1 4 1 } constant spr
slm spr 8 0.9 2 nn.gen . drop""")
    # full 4-scalar form on an EXACTLY 6-deep stack (regression: the
    # probe window must reach ss[-5] to see M under T n temp k p)
    out2 = t4.forth("slm spr 8 0.9 2 0.95 nn.gen . drop")
    assert "vector[12]" in out, f"top-k form failed: {out[-400:]}"
    assert "vector[12]" in out2, f"top-p form failed: {out2[-400:]}"
    assert "nn.gen?" not in out2


def test_rope_attn_save_load_roundtrip(t4, tmp_path):
    p = tmp_path / "rlm.t4"
    t4.forth("""0 trace
1 12 1 1 nn.model
16 16 nn.embed 3 4 nn.attn tanh 16 nn.proj softmax constant rsv""")
    t4.forth(f'rsv s" {p}" save drop')
    text = open(p, "rb").read().decode("latin-1")
    assert "3 4 nn.attn" in text, f"rope flags not persisted: {text[:400]}"
    out = t4.forth(f'1 12 1 1 nn.model constant rld\n'
                   f'rld s" {p}" load network')
    assert "attn" in out
    from tensorforth_tpu.mu.mmu import MMU
    models = [o for o in MMU.get_mmu()._objs.values()
              if getattr(o, "is_model", lambda: False)()]
    assert any(len(m.data) > 1 and m[1].grad_fn is not None
               and int(float(m[1].xparm)) == 3 for m in models), \
        "loaded model lost the rope flag"
