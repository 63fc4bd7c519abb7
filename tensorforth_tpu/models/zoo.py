"""Model zoo — the reference's example-script topologies built through
the nn API (same nets the .4th scripts assemble word by word).

  mnist_cnn : examples/t4_30e.4th nn_c (conv-pool-relu + 2 linear)
  gan_mnist : examples/t4_40b.4th G/D MLP pair
  cifar_cnn : examples/t4_42a.4th conv+batchnorm stack
"""
from __future__ import annotations

from ..mu.mmu import MMU
from ..nn.ntypes import Layer


def _new_model(n, h, w, c):
    mmu = MMU.get_mmu()
    m = mmu.model()
    m.npush(mmu.tensor(n, h, w, c))
    return m


def mnist_cnn(batch: int = 100):
    """t4_30e nn_c: 0.5 10 conv2d / 2 maxpool / relu / flatten /
    100 linear relu / 10 linear softmax"""
    m = _new_model(batch, 28, 28, 1)
    m.add(Layer.CONV, 10, 0.5, [3, 1, 0, 1])
    m.add(Layer.MAXPOOL, 2)
    m.add(Layer.RELU)
    m.add(Layer.FLATTEN)
    m.add(Layer.LINEAR, 100, 1.0)
    m.add(Layer.RELU)
    m.add(Layer.LINEAR, 10, 1.0)
    m.add(Layer.SOFTMAX)
    return m


def gan_mnist(batch: int = 256):
    """t4_40b G (128->256->512->784 tanh) and D (784->512->256->1 sigmoid)"""
    g = _new_model(batch, 128, 1, 1)
    g.add(Layer.LINEAR, 256, 1.0)
    g.add(Layer.LEAKYRL, 0, 0.2)
    g.add(Layer.LINEAR, 512, 1.0)
    g.add(Layer.LEAKYRL, 0, 0.2)
    g.add(Layer.LINEAR, 784, 1.0)
    g.add(Layer.TANH)

    d = _new_model(batch, 28, 28, 1)
    d.add(Layer.LINEAR, 512, 1.0)
    d.add(Layer.LEAKYRL, 0, 0.2)
    d.add(Layer.DROPOUT, 0, 0.3)
    d.add(Layer.LINEAR, 256, 1.0)
    d.add(Layer.LEAKYRL, 0, 0.2)
    d.add(Layer.DROPOUT, 0, 0.3)
    d.add(Layer.LINEAR, 1, 1.0)
    d.add(Layer.SIGMOID)
    return g, d


def tiny_transformer(batch: int = 32, seq: int = 16, dim: int = 32,
                     heads: int = 4, classes: int = 10, layers: int = 2):
    """sequence classifier: [N, S, E, 1] tokens -> attention blocks ->
    flatten -> linear softmax (extension tier — the reference's roadmap
    Transformer, realized with the nn.attn layer + Pallas flash core)"""
    m = _new_model(batch, seq, dim, 1)
    for _ in range(layers):
        m.add(Layer.ATTN, heads)
        m.add(Layer.TANH)
    m.add(Layer.FLATTEN)
    m.add(Layer.LINEAR, classes, 1.0)
    m.add(Layer.SOFTMAX)
    return m


def tiny_moe(batch: int = 8, seq: int = 8, dim: int = 16, experts: int = 4,
             hidden: int = 32, top_k: int = 2, classes: int = 4):
    """sequence classifier with a mixture-of-experts FFN block
    (extension tier): [N, S, D, 1] -> attn -> moe -> flatten -> linear
    softmax; experts shard over 'ep' under T4_MESH=dpX,epY"""
    m = _new_model(batch, seq, dim, 1)
    m.add(Layer.ATTN, 4)
    m.add(Layer.MOE, experts, float(hidden), [top_k])
    m.add(Layer.TANH)
    m.add(Layer.FLATTEN)
    m.add(Layer.LINEAR, classes, 1.0)
    m.add(Layer.SOFTMAX)
    return m


def tiny_lm(batch: int = 4, seq: int = 16, vocab: int = 32, dim: int = 32,
            heads: int = 4, layers: int = 2, rope: bool = False):
    """character-level language model (extension, LM/serving tier):
    [N,S,1,1] token ids -> embed -> (lnorm + causal attn + tanh)* ->
    lnorm -> position-wise proj -> per-position softmax; serves
    autoregressively through nn/serve.py (KV-cache decode).
    rope=True adds rotary position embeddings to every attention layer
    (attn flags bit1)"""
    m = _new_model(batch, seq, 1, 1)
    m.add(Layer.EMBED, vocab, float(dim))
    flags = 3.0 if rope else 1.0             # causal [+ rope]
    for _ in range(layers):
        m.add(Layer.LNORM)
        m.add(Layer.ATTN, heads, flags)
        m.add(Layer.TANH)
    m.add(Layer.LNORM)
    m.add(Layer.PROJ, vocab)
    m.add(Layer.SOFTMAX)
    return m


def cifar_cnn(batch: int = 256):
    """t4_42a M0: conv64+bn+relu+pool / conv128+bn+relu+pool+drop /
    512 linear bn relu drop / 10 linear softmax"""
    m = _new_model(batch, 32, 32, 3)
    m.add(Layer.CONV, 64, 0.0, [3, 1, 0, 1])
    m.add(Layer.BATCHNM, 0, 0.01)
    m.add(Layer.RELU)
    m.add(Layer.MAXPOOL, 2)
    m.add(Layer.CONV, 128, 0.0, [3, 1, 0, 1])
    m.add(Layer.BATCHNM, 0, 0.01)
    m.add(Layer.RELU)
    m.add(Layer.MAXPOOL, 2)
    m.add(Layer.DROPOUT, 0, 0.2)
    m.add(Layer.LINEAR, 512, 1.0)
    m.add(Layer.BATCHNM, 0, 0.1)
    m.add(Layer.RELU)
    m.add(Layer.DROPOUT, 0, 0.5)
    m.add(Layer.LINEAR, 10, 1.0)
    m.add(Layer.SOFTMAX)
    return m
