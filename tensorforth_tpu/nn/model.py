"""Model — sequential NN container (tier-3 object).

Reference behavior: src/nn/model.{h,cpp} (layer factory, output-dim
arithmetic, Kaiming-uniform init, MM_DEBUG deterministic fill),
forward.cu / backprop.cu / gradient.cu / loss.cpp entry points.

The container holds per-layer activation Tensors exactly like the
reference (``n@`` fetches them; backprop overwrites them with gradients)
but the compute runs as whole-network jitted XLA executables built in
funcs.py — one device dispatch per forward/backprop/optimizer word.
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp
import jax

from ..config import Config
from ..mu.tensor import Tensor, T4Type
from .ntypes import Layer, Loss, Optimizer
from . import funcs

_ZERO1 = None                    # lazy shared placeholder gradient
_F32 = {}                        # host-scalar -> device jnp.float32 memo
                                 # (a fresh upload per batch costs a
                                 # tunnel round-trip on the TPU path)


def _jf32(v: float):
    v = float(v)
    r = _F32.get(v)
    if r is None:
        if len(_F32) > 4096:     # pathological lr sweeps: don't leak
            _F32.clear()
        r = _F32[v] = jnp.float32(v)
    return r


_I32 = {}                        # host int -> device int32 memo: corpus
#                                  positions recur every epoch, and a
#                                  fresh scalar upload stalls the chunk
#                                  program launch one full tunnel RTT
#                                  (~28 ms measured — 0.28 ms/batch at
#                                  the default window)


def _ji32(v: int):
    v = int(v)
    r = _I32.get(v)
    if r is None:
        if len(_I32) > 8192:
            _I32.clear()
        r = _I32[v] = jnp.int32(v)
    return r


_KEY0 = None


def _key0():
    global _KEY0
    if _KEY0 is None:
        _KEY0 = jax.random.PRNGKey(0)
    return _KEY0


class Model:
    _live: "weakref.WeakSet" = None           # all constructed models —
    #                                           the NaN-materialization
    #                                           sentinel walks this set

    def __init__(self, mmu, trace: int = 0):
        self.oid = 0
        self.ttype = T4Type.MODEL
        self.rank = 0
        self.data: list[Tensor] = []          # layer tensors (activations)
        self.train = 1
        self.err = 0
        self.max_norm = 0.0
        self.epoch = 0
        self._mmu = mmu
        self._trace = trace
        self._hot: Tensor | None = None       # cached onehot vector
        self._loss: Tensor | None = None
        self._hit = 0
        self._iter = 0
        self._opt_inited = False
        # macro-op fusion (VERDICT r2 #2): after one canonical
        # forward/loss/backprop/optimizer cycle, the next cycle runs as
        # ONE fused device program; words apply slices of the stash
        self._cycle: list = []                # verbs since last opt step
        self._fuse_sig = None                 # last canonical cycle sig
        self._pending = None                  # stashed fused outputs
        self._chunk = None                    # trace-chunk state (K-batch
        #                                       fused dispatch, see
        #                                       funcs.get_fused_chunk_ds)
        self._fuse_hits = 0                   # consecutive CONSUMED fused
        #                                       cycles (chunking arms at 1)
        self._fin_tail = None                 # most recent COMPLETED chunk,
        #                                       retained for the NaN sentinel
        #                                       (err-bit rollback window)
        self._fin_log = []                    # consumed single-cycle finite
        #                                       statuses [(seq, pos, fin)] —
        #                                       exact attribution for faults
        #                                       in the chunk-arming batches
        self._fin_seq = 0                     # dispatch-order stamp so the
        #                                       sentinel scans windows oldest
        #                                       first (first fault wins)
        Model._live.add(self)

    # --- macro-op fusion bookkeeping -----------------------------------------
    def fuse_break(self):
        """any out-of-cycle mutation (nn.w=, nn.zero, onehot swap, ...)
        invalidates the speculative optimizer/grad results; data already
        applied by earlier words in the cycle stays (it was real)"""
        self._chunk_abort()
        self._pending = None
        self._fuse_sig = None
        self._fuse_hits = 0
        self._fin_tail = None    # a live-state mutation invalidates the
        #                          NaN sentinel's replay window (a later
        #                          rollback would clobber the mutation)
        self._fin_log.clear()
        if self._cycle and self._cycle[-1] != "dirty":
            self._cycle.append("dirty")

    def chunk_sync(self):
        """materialize exact per-batch tensor state before out-of-cycle
        introspection (nn.w / nn.dw / n@ / network / persistence) —
        rollback-replay of any active trace chunk; no-op otherwise"""
        self._chunk_abort()

    def _note_opt(self, opt: str, hyper: tuple):
        """optimizer step ends a cycle: record whether it was canonical
        (fusable) and arm the next cycle"""
        c = self._cycle
        canonical = (len(c) >= 1 and c[0] == "fwd_ds"
                     and c.count("fwd_ds") == 1
                     and c.count("bwd") == 1 and "dirty" not in c
                     and all(v in ("fwd_ds", "bwd") or v.startswith("loss:")
                             for v in c)
                     and c.index("bwd") > 0)
        loss_ops = {v[5:] for v in c if v.startswith("loss:")}
        if canonical and len(loss_ops) <= 1:
            self._fuse_sig = (self._program(), bool(self.train),
                              loss_ops.pop() if loss_ops else "ce",
                              opt, hyper)
        else:
            self._fuse_sig = None
        self._cycle = []

    # --- T4Base duck-type ---------------------------------------------------
    @property
    def numel(self) -> int:
        return len(self.data)

    @property
    def grad(self):
        return [None] * 5

    def is_model(self) -> bool:
        return True

    def is_tensor(self) -> bool:
        return False

    def is_dataset(self) -> bool:
        return False

    def is_future(self) -> bool:
        return False

    @staticmethod
    def nname(i) -> str:
        """padded 7-char layer name (reference LAYER_OP strings)"""
        return Layer.NAMES[i if i is not None else 0]

    # --- layer stack access ----------------------------------------------------
    def __getitem__(self, i: int) -> Tensor:
        return self.data[i if i >= 0 else self.numel + i]

    def npush(self, t: Tensor) -> "Model":
        self.fuse_break()             # topology mutation: drain any chunk
        self.data.append(t)
        if self.numel >= Config.NET_SZ:
            from ..system import System
            System.get_sys().perr("", "Model layer storage maxed out ")
        return self

    def npop(self) -> Tensor:
        return self.data.pop() if self.data else None

    def batch_size(self) -> int:
        return self.data[0].N() if self.data else 1

    def tick(self):
        self.epoch += 1

    # --- tensor helpers -------------------------------------------------------
    def _T4(self, *dims) -> Tensor:
        return self._mmu.tensor(*dims)

    def _rand(self, t: Tensor, scale: float):
        """uniform init in [-scale, scale) (reference Model::RAND)"""
        from ..system import System
        System.get_sys().rand_fill(t, "uniform", bias=-0.5, scale=scale * 2.0)

    # =========================================================================
    # layer factory (reference Model::add, model.cpp:83-310)
    # =========================================================================
    def add(self, fn: int, n: int = 0, bias: float = 0.0, opt=None) -> "Model":
        self.fuse_break()             # topology mutation: drain any chunk
        t_in = self[-1]
        if t_in.grad_fn is not None:
            return self
        t_in.grad = [None] * 5
        t_in.mtum = [None] * 5
        if fn in (Layer.CONV, Layer.DCONV):
            self._iconv(t_in, n, bias, opt or [3, 1, 0, 1], fn == Layer.DCONV)
        elif fn == Layer.LINEAR:
            self._ilinear(t_in, n, bias)
        elif fn == Layer.FLATTEN:
            self._iflatten(t_in)
        elif fn in (Layer.RELU, Layer.TANH, Layer.SIGMOID, Layer.SELU,
                    Layer.LEAKYRL, Layer.ELU, Layer.DROPOUT):
            self._iactivate(t_in, bias)
        elif fn in (Layer.SOFTMAX, Layer.LOGSMAX):
            self._isoftmax(t_in)
        elif fn in (Layer.AVGPOOL, Layer.MAXPOOL, Layer.MINPOOL):
            self._ipool(t_in, int(n))
        elif fn == Layer.BATCHNM:
            self._ibatchnorm(t_in, bias)
        elif fn == Layer.USAMPLE:
            self._iup(t_in, int(n), bias)
        elif fn == Layer.ATTN:
            self._iattn(t_in, int(n), int(bias))
        elif fn == Layer.MOE:
            self._imoe(t_in, int(n), int(bias), opt or [2])
        elif fn == Layer.LNORM:
            self._ilnorm(t_in, bias)
        elif fn == Layer.EMBED:
            self._iembed(t_in, int(n), bias)
        elif fn == Layer.PROJ:
            self._iproj(t_in, int(n), bias)
        else:
            self._err(f"Model#add layer {fn} not supported")
            return self
        t_in.grad_fn = fn
        return self

    def _err(self, msg: str):
        from ..system import System
        System.get_sys().perr("", msg + " ")

    def _iconv(self, t_in: Tensor, C0: int, bias: float, opt, txn: bool):
        N1, H1, W1, C1 = t_in.N(), t_in.H(), t_in.W(), t_in.C()
        K, S, D = int(opt[0]), int(opt[1]), int(opt[3])
        P = int(opt[2]) if (K > 1 and opt[2]) else (K - 1) // 2
        if txn:
            P0 = (H1 + P * 2 - K) % S
            H0 = (H1 - 1) * S - P * 2 + K + P0
            W0 = (W1 - 1) * S - P * 2 + K + P0
        else:
            H0 = (H1 - K + P * 2) // S + 1
            W0 = (W1 - K + P * 2) // S + 1
        if (not txn and K not in (1, 3, 5)) or (txn and K != 4):
            self._err(f"conv kernel {K}x{K}? 1/3/5 (4 for dconv2d) only")
            return
        t_in.stride = [S, S, P, P]
        t_in.xparm = bias
        f = self._T4(C1, K, K, C0)
        b = self._T4(C0)
        t_in.grad[0], t_in.grad[1] = f, b
        t_in.grad[2] = self._T4(C1, K, K, C0)
        t_in.grad[3] = self._T4(C0)
        t_in.grad[4] = self._T4(N1, H1, W1, C1)
        k = math.sqrt(6.0 / (K * K * C1))
        if Config.MM_DEBUG:
            f.set_numpy(np.full(f.numel, 0.5, np.float32))
            b.set_numpy(np.full(b.numel, -0.5, np.float32))
        else:
            self._rand(f, k)
            self._rand(b, bias)
        self.npush(self._T4(N1, H0, W0, C0))

    def _ilinear(self, t_in: Tensor, E0: int, bias: float):
        N1 = t_in.N()
        E1 = t_in.HWC()
        w = self._T4(1, E0, E1, 1)
        b = self._T4(E0)
        t_in.grad[0], t_in.grad[1] = w, b
        t_in.grad[2] = self._T4(1, E0, E1, 1)
        t_in.grad[3] = self._T4(E0)
        t_in.xparm = bias
        k = math.sqrt(1.0 / (E0 + E1))
        if Config.MM_DEBUG:
            a = np.full(w.numel, 0.5, np.float32)
            a[(w.numel >> 1) - 1] = 1.0
            w.set_numpy(a)
            b.set_numpy(np.zeros(E0, np.float32))
        else:
            self._rand(w, k)
            self._rand(b, bias)
        self.npush(self._T4(N1, 1, E0, 1))

    def _iflatten(self, t_in: Tensor):
        self.npush(self._T4(t_in.N(), 1, t_in.HWC(), 1))

    def _isoftmax(self, t_in: Tensor):
        t_in.grad[4] = self._T4(1, t_in.H(), t_in.W(), t_in.C())
        self.npush(self._T4(t_in.N(), t_in.H(), t_in.W(), t_in.C()))

    def _iactivate(self, t_in: Tensor, alpha: float):
        t_in.grad[4] = self._T4(t_in.N(), t_in.H(), t_in.W(), t_in.C())
        t_in.xparm = alpha
        self.npush(self._T4(t_in.N(), t_in.H(), t_in.W(), t_in.C()))

    def _ipool(self, t_in: Tensor, k: int):
        if k not in (2, 3):
            self._err(f"pool k={k}? 2x2 and 3x3 only")
            return
        H0 = (t_in.H() + k - 1) // k
        W0 = (t_in.W() + k - 1) // k
        t_in.stride = [k, 1, 1, 0]
        self.npush(self._T4(t_in.N(), H0, W0, t_in.C()))

    def _ibatchnorm(self, t_in: Tensor, m: float):
        C = t_in.C()
        g = self._T4(C)
        g.set_numpy(np.ones(C, np.float32))
        t_in.grad[0] = g
        t_in.grad[1] = self._T4(C)
        t_in.grad[2] = self._T4(C)
        t_in.grad[3] = self._T4(C)
        t_in.grad[4] = self._T4(t_in.N(), t_in.H(), t_in.W(), t_in.C())
        t_in.mtum[4] = self._T4(C * 3)
        t_in.xparm = m
        self.npush(self._T4(t_in.N(), t_in.H(), t_in.W(), t_in.C()))

    def _iattn(self, t_in: Tensor, heads: int, flags: int = 0):
        """multi-head self-attention layer (extension): input [N,S,E,1];
        wqkv [1,3E,E,1] in the weight slot, wo [1,E,E,1] in the bias slot
        (the optimizer treats slot pairs generically).  flags bit0 =
        causal mask, bit1 = rotary position embedding (RoPE)"""
        N1, S = t_in.N(), t_in.H()
        E = t_in.W() * t_in.C()
        if heads < 1 or E % heads:
            self._err(f"attn E={E} not divisible by heads={heads}")
            return
        if (flags & 2) and (E // heads) % 2:
            self._err(f"attn rope needs even head dim, got {E // heads}")
            return
        wqkv = self._T4(1, 3 * E, E, 1)
        wo = self._T4(1, E, E, 1)
        t_in.grad[0], t_in.grad[1] = wqkv, wo
        t_in.grad[2] = self._T4(1, 3 * E, E, 1)
        t_in.grad[3] = self._T4(1, E, E, 1)
        t_in.iparm = heads
        t_in.xparm = float(flags & 3)
        k = math.sqrt(1.0 / (2 * E))
        if Config.MM_DEBUG:
            wqkv.set_numpy(np.full(wqkv.numel, 0.5, np.float32))
            wo.set_numpy(np.full(wo.numel, 0.5, np.float32))
        else:
            self._rand(wqkv, k)
            self._rand(wo, k)
        self.npush(self._T4(N1, S, E, 1))

    def _imoe(self, t_in: Tensor, experts: int, hidden: int, opt):
        """mixture-of-experts FFN layer (extension): input [N,S,D,1];
        the router is PACKED into the weight slot's last column —
        w1aug [E,D,F+1,1] = experts' w1 [E,D,F] ++ router wr [E,D,1] —
        and w2 [E,F,D,1] sits in the bias slot, so the layer keeps the
        generic two-slot (w,b) optimizer/IO contract (same move as the
        attention layer's packed qkv).  Expert axis E shards over the
        mesh's model axis ('ep'/'tp') for expert parallelism."""
        N1, S = t_in.N(), t_in.H()
        D = t_in.W() * t_in.C()
        top_k = int(opt[0]) if opt else 2
        if experts < 1 or hidden < 1 or not (1 <= top_k <= experts):
            self._err(f"moe E={experts} F={hidden} k={top_k}?")
            return
        w1 = self._T4(experts, D, hidden + 1, 1)
        w2 = self._T4(experts, hidden, D, 1)
        t_in.grad[0], t_in.grad[1] = w1, w2
        t_in.grad[2] = self._T4(experts, D, hidden + 1, 1)
        t_in.grad[3] = self._T4(experts, hidden, D, 1)
        t_in.iparm = experts
        t_in.stride = [top_k, hidden, 0, 0]
        k = math.sqrt(1.0 / (D + hidden))
        if Config.MM_DEBUG:
            w1.set_numpy(np.full(w1.numel, 0.5, np.float32))
            w2.set_numpy(np.full(w2.numel, 0.5, np.float32))
        else:
            self._rand(w1, k)
            self._rand(w2, k)
        self.npush(self._T4(N1, S, D, 1))

    def _ilnorm(self, t_in: Tensor, eps: float):
        """layer normalization (extension): per-sample over the feature
        axis (W*C), learnable gamma/beta — the transformer-tier norm the
        reference's roadmap implies (README.md:702-720)"""
        E = t_in.W() * t_in.C()
        g = self._T4(E)
        g.set_numpy(np.ones(E, np.float32))
        t_in.grad[0] = g
        t_in.grad[1] = self._T4(E)
        t_in.grad[2] = self._T4(E)
        t_in.grad[3] = self._T4(E)
        t_in.xparm = eps if eps > 0.0 else 1.0e-5
        self.npush(self._T4(t_in.N(), t_in.H(), t_in.W(), t_in.C()))

    def _iembed(self, t_in: Tensor, vocab: int, dim: float):
        """token embedding (extension, LM tier): input [N,S,1,1] float
        ids -> [N,S,E,1]; table [1,V,E,1] in the weight slot, bias [E]"""
        N1, S = t_in.N(), t_in.H()
        E = int(dim)
        if vocab < 2 or E < 1:
            self._err(f"embed V={vocab} E={E}?")
            return
        w = self._T4(1, vocab, E, 1)
        b = self._T4(E)
        t_in.grad[0], t_in.grad[1] = w, b
        t_in.grad[2] = self._T4(1, vocab, E, 1)
        t_in.grad[3] = self._T4(E)
        t_in.iparm = vocab
        k = math.sqrt(1.0 / E)
        if Config.MM_DEBUG:
            w.set_numpy(np.full(w.numel, 0.5, np.float32))
            b.set_numpy(np.zeros(E, np.float32))
        else:
            self._rand(w, k)
            b.set_numpy(np.zeros(E, np.float32))
        self.npush(self._T4(N1, S, E, 1))

    def _iproj(self, t_in: Tensor, V: int, bias: float):
        """position-wise projection (extension, LM head): [N,S,E,1] ->
        [N,S,V,1]; w [1,V,E,1], b [V] (contrast LINEAR which flattens)"""
        N1, S = t_in.N(), t_in.H()
        E = t_in.W() * t_in.C()
        w = self._T4(1, V, E, 1)
        b = self._T4(V)
        t_in.grad[0], t_in.grad[1] = w, b
        t_in.grad[2] = self._T4(1, V, E, 1)
        t_in.grad[3] = self._T4(V)
        t_in.xparm = bias
        k = math.sqrt(1.0 / (V + E))
        if Config.MM_DEBUG:
            w.set_numpy(np.full(w.numel, 0.5, np.float32))
            b.set_numpy(np.zeros(V, np.float32))
        else:
            self._rand(w, k)
            self._rand(b, bias)
        self.npush(self._T4(N1, S, V, 1))

    def _iup(self, t_in: Tensor, k: int, method: float):
        if k not in (2, 3):
            self._err(f"upsample k={k}? 2x2 and 3x3 only")
            return
        t_in.iparm = int(method)
        t_in.stride = [k, 1, 1, 1]
        self.npush(self._T4(t_in.N(), t_in.H() * k, t_in.W() * k, t_in.C()))

    # =========================================================================
    # jit program assembly
    # =========================================================================
    def _program(self):
        prog = []
        for i in range(self.numel - 1):
            t_in, t_out = self[i], self[i + 1]
            kind = t_in.grad_fn
            if kind in (Layer.CONV, Layer.DCONV):
                opts = (t_in.stride[0], t_in.stride[2])
            elif kind == Layer.ATTN:
                flags = int(float(t_in.xparm))
                opts = (t_in.iparm, bool(flags & 1), bool(flags & 2))
            elif kind == Layer.MOE:
                opts = (t_in.iparm, t_in.stride[1], t_in.stride[0])
            elif kind == Layer.LNORM:
                opts = (float(t_in.xparm),)
            elif kind in (Layer.RELU, Layer.TANH, Layer.SIGMOID, Layer.SELU,
                          Layer.LEAKYRL, Layer.ELU, Layer.DROPOUT):
                opts = (float(t_in.xparm),)
            elif kind in (Layer.MAXPOOL, Layer.AVGPOOL, Layer.MINPOOL,
                          Layer.USAMPLE):
                opts = (t_in.stride[0],)
            else:
                opts = ()
            prog.append((kind, opts, t_out.shape))
        return tuple(prog)

    def _params(self):
        out = []
        for i in range(self.numel - 1):
            t_in = self[i]
            kind = t_in.grad_fn
            if kind in (Layer.CONV, Layer.DCONV, Layer.BATCHNM,
                        Layer.LNORM):
                out.append((t_in.grad[0].ensure_data(),
                            t_in.grad[1].ensure_data()))
            elif kind in (Layer.LINEAR, Layer.EMBED, Layer.PROJ):
                w = t_in.grad[0]
                out.append((w.data_as(w.H(), w.W()),
                            t_in.grad[1].ensure_data()))
            elif kind == Layer.ATTN:
                w, wo = t_in.grad[0], t_in.grad[1]
                out.append((w.data_as(w.H(), w.W()),
                            wo.data_as(wo.H(), wo.W())))
            elif kind == Layer.MOE:
                w1, w2 = t_in.grad[0], t_in.grad[1]
                out.append((w1.data_as(w1.N(), w1.H(), w1.W()),
                            w2.data_as(w2.N(), w2.H(), w2.W())))
            else:
                out.append(())
        return tuple(out)

    # =========================================================================
    # forward (reference forward.cu)
    # =========================================================================
    def forward(self, inp: Tensor) -> "Model":
        from ..system import System
        sys = System.get_sys()
        n0 = self[0]
        if inp.numel != n0.numel:
            self._err(f"nn#forward dataset wrong shape {inp.shape} != "
                      f"model input {n0.shape}")
            self.err = 1
            return self
        prog = self._program()
        # only dropout consumes the key — skip the per-batch device op
        # (and keep the word path deterministic) when none is present
        if any(k == Layer.DROPOUT for k, _o, _s in prog):
            seed = sys.next_key()
            self._fwd_seed = seed      # _chunk_fwd verifies this against
            #                            the chunk's precomputed seed run
            key = jax.random.PRNGKey(seed)
        else:
            self._fwd_seed = None
            key = _key0()
        hot = hit = None
        if inp.is_dataset():
            spec = getattr(inp, "_fetch_spec", None)
            if self._chunk is not None and self._chunk_fwd(inp, spec,
                                                           prog):
                self._cycle.append("fwd_ds")
                return self
            if self._pending is not None:
                # previous cycle's speculative opt results were never
                # consumed (e.g. an eval-only loop) — drop them and
                # disarm so eval forwards stop paying the fused cost
                self._pending = None
                self._fuse_sig = None
                self._fuse_hits = 0
            fused = None
            if spec is not None and inp.data is None:
                if self._maybe_chunk_dispatch(prog, inp, key, spec):
                    inp._fetch_spec = None
                    self._cycle.append("fwd_ds")
                    return self
                if self.err:          # NaN sentinel fault during the
                    return self       # dispatch check (eager mode) —
                #                       don't clobber the rolled-back
                #                       state; netvm STOPs on err
                # fetch-FOLDED cycle: the batch is still only a (corpus,
                # pos) spec — slice+normalize runs inside the one fused
                # program (zero separate fetch dispatch)
                r = self._try_fused_ds(prog, inp, key, spec)
                if r is not None:
                    x0, lab, outs, masks, hot, hit = r
                    inp._fetch_spec = None
                    inp.replace_data(x0)
                    inp.label_dev = lab
                    # same array when shapes match — no extra dispatch
                    n0.replace_data(inp.data_as(*n0.shape))
                    fused = True
            if fused is None:
                n0.replace_data(inp.data_as(*n0.shape))
                ld = getattr(inp, "label_dev", None)
                if ld is not None and ld.shape[0] == n0.N():
                    labels = ld              # device slice from the fused
                    #                          fetch program — no upload
                else:
                    labels = jnp.asarray(inp.label[:n0.N()],
                                         dtype=jnp.int32)
                fused = self._try_fused(prog, n0, labels, key)
                if fused is not None:
                    outs, masks, hot, hit = fused
                else:
                    fwd = funcs.get_forward_with_metrics(prog)
                    outs, masks, hot, hit = fwd(n0.ensure_data(),
                                                self._params(), key,
                                                labels)
            self._cycle.append("fwd_ds")
        else:
            self._chunk_abort()               # weights must be current
            n0.replace_data(inp.data_as(*n0.shape))
            fwd = funcs.get_forward(prog)
            outs, masks = fwd(n0.ensure_data(), self._params(), key)
            self._cycle.append("dirty")       # non-dataset cycles unfused
        self._apply_fwd_stash(outs, masks,
                              hot if inp.is_dataset() else None, hit)
        if sys.trace:
            self._trace_pass("forward", range(self.numel - 1))
        return self

    def _apply_fwd_stash(self, outs, masks, hot=None, hit=None):
        """materialize a forward stash into the layer tensors (shared by
        the per-batch paths and the trace-chunk final-batch apply)"""
        for i, (o, m) in enumerate(zip(outs, masks)):
            self[i + 1].replace_data(o)
            t_in = self[i]
            if m is None:
                continue
            if t_in.grad_fn == Layer.BATCHNM:
                xhat, rvar = m
                t_in.grad[4].replace_data(xhat)
                C = t_in.C()
                # stays on device: np.asarray(rvar) here would force a
                # device->host sync EVERY batch (25 ms on the tunnel)
                t_in.mtum[4].replace_data(
                    jnp.concatenate([jnp.ravel(rvar),
                                     jnp.zeros(2 * C, jnp.float32)]))
            elif t_in.grad[4] is not None:
                t_in.grad[4].replace_data(m)
        if hot is not None:
            if self._hot is None:
                out = self[-1]
                self._hot = self._T4(out.N(), 1, out.HWC(), 1)
            self._hot.replace_data(hot)
            self._hit = hit                   # device scalar, lazy sync

    def _try_fused(self, prog, n0, labels, key):
        """speculatively run the whole canonical cycle as one program
        when the previous cycle proved the pattern; returns the
        (outs, masks, hot, hit) slice or None for the unfused path"""
        sig = self._fuse_sig
        if (sig is None or not self._opt_inited or not self.train
                or sig[0] != prog or sig[1] != bool(self.train)):
            return None
        import os
        if os.environ.get("T4_NO_FUSE", "0") == "1":
            return None
        _, _, loss_op, opt, hyper = sig
        tr = self._trainables()
        ms = [t.mtum[s].ensure_data() for t, s in tr]
        if opt in ("adam", "adamw"):
            if any(t.mtum[s + 2] is None for t, s in tr):
                return None
            vs = tuple(t.mtum[s + 2].ensure_data() for t, s in tr)
        else:
            vs = ()
        dws, dbs = self._gather_grads()
        fn = funcs.get_fused_cycle(prog, bool(self.train), loss_op, opt,
                                   self._ndivs(), funcs.word_mesh())
        res = fn(n0.ensure_data(), self._params(), dws, dbs,
                 tuple(ms), vs, labels, key, *(_jf32(h) for h in hyper))
        (outs, masks, hot, hit, lval, dout, dxs, ndws, ndbs,
         nws, nms, nvs, zdws, fin) = res
        self._pending = {
            "loss_op": loss_op, "opt": opt, "hyper": hyper,
            "lval": lval, "dout": dout, "dxs": dxs,
            "ndws": ndws, "ndbs": ndbs, "nws": nws, "nms": nms,
            "nvs": nvs, "zdws": zdws, "fin": fin, "pos": None,
            "seq": self._next_fin_seq(), "bwd_done": False,
        }
        return outs, masks, hot, hit

    def _try_fused_ds(self, prog, inp, key, pos):
        """fetch-FOLDED fused cycle: like _try_fused but the batch
        slice + normalize from the device-resident U8 corpus runs
        inside the one program (funcs.get_fused_cycle_ds) — the
        canonical word loop costs ONE device dispatch per batch.
        Returns (x, labels, outs, masks, hot, hit) or None."""
        sig = self._fuse_sig
        if (sig is None or not self._opt_inited or not self.train
                or sig[0] != prog or sig[1] != bool(self.train)):
            return None
        import os
        if os.environ.get("T4_NO_FUSE", "0") == "1":
            return None
        cp = getattr(inp, "_corpus", None)
        if cp is None or getattr(cp, "_dev_cache", None) is None \
                or cp._dev_cache is False:
            return None
        _, _, loss_op, opt, hyper = sig
        tr = self._trainables()
        ms = [t.mtum[s].ensure_data() for t, s in tr]
        if opt in ("adam", "adamw"):
            if any(t.mtum[s + 2] is None for t, s in tr):
                return None
            vs = tuple(t.mtum[s + 2].ensure_data() for t, s in tr)
        else:
            vs = ()
        dws, dbs = self._gather_grads()
        fn = funcs.get_fused_cycle_ds(
            prog, bool(self.train), loss_op, opt, self._ndivs(),
            inp.batch_sz, float(inp._mean), float(inp._scale),
            tuple(self[0].shape),          # model-input shape, not the
            funcs.word_mesh())             # dataset's (equal numel)
        res = fn(cp._dev_cache, cp._dev_labels, _ji32(pos), self._params(),
                 dws, dbs, tuple(ms), vs, key,
                 *(_jf32(h) for h in hyper))
        (x0, lab, outs, masks, hot, hit, lval, dout, dxs, ndws, ndbs,
         nws, nms, nvs, zdws, fin) = res
        self._pending = {
            "loss_op": loss_op, "opt": opt, "hyper": hyper,
            "lval": lval, "dout": dout, "dxs": dxs,
            "ndws": ndws, "ndbs": ndbs, "nws": nws, "nms": nms,
            "nvs": nvs, "zdws": zdws, "fin": fin, "pos": int(pos),
            "seq": self._next_fin_seq(), "bwd_done": False,
        }
        return x0, lab, outs, masks, hot, hit

    # =========================================================================
    # trace-chunked execution: K canonical cycles per device dispatch
    # (funcs.get_fused_chunk_ds).  The single-batch fused cycle still
    # pays one ~3 ms tunnel dispatch per batch; once the canonical
    # pattern has been observed AND consumed (one fused cycle), the
    # next forward dispatches a K-batch scan and the words serve from
    # per-batch loss/hit vectors (LazyIdx futures — zero dispatches).
    # Tensor state materializes for the FINAL batch of each chunk; any
    # out-of-cycle introspection rolls back and replays per-batch
    # (chunk_sync), so observable semantics match unfused execution.
    # =========================================================================
    def _chunk_plan(self, inp, pos: int) -> int:
        """chunk length: full batches left in the (possibly
        T4_MAX_BATCH-truncated) corpus window, capped at T4_CHUNK"""
        import os
        try:
            kmax = int(os.environ.get("T4_CHUNK", "100"))
        except ValueError:
            kmax = 100
        if kmax <= 1:
            return 0
        cp = getattr(inp, "_corpus", None)
        if cp is None:
            return 0
        b = inp.batch_sz
        size = cp.size
        max_b = int(os.environ.get("T4_MAX_BATCH", "0") or 0)
        if max_b:                     # mirror Corpus.fetch windowing
            size = min(size, max_b * b)
        return min(kmax, max(0, (size - int(pos)) // b))

    def _maybe_chunk_dispatch(self, prog, inp, key, pos) -> bool:
        import os
        from ..system import System
        sig = self._fuse_sig
        if (sig is None or not self._opt_inited or not self.train
                or sig[0] != prog or sig[1] != bool(self.train)
                or self._fuse_hits < 1
                or os.environ.get("T4_NO_FUSE", "0") == "1"
                or System.get_sys().trace):
            return False
        cp = getattr(inp, "_corpus", None)
        if cp is None or getattr(cp, "_dev_cache", None) is None \
                or cp._dev_cache is False:
            return False
        k_batches = self._chunk_plan(inp, pos)
        if k_batches < 2:
            return False
        _, _, loss_op, opt, hyper = sig
        tr = self._trainables()
        ms = tuple(t.mtum[s].ensure_data() for t, s in tr)
        if opt in ("adam", "adamw"):
            if any(t.mtum[s + 2] is None for t, s in tr):
                return False
            vs = tuple(t.mtum[s + 2].ensure_data() for t, s in tr)
        else:
            vs = ()
        dws, dbs = self._gather_grads()
        params = self._params()
        # per-batch dropout keys: this forward already burned seed s1
        # (self._fwd_seed, the `key` arg); the served forwards of
        # batches 2..K will each burn one more next_key() — peek that
        # exact seed run so the scan reproduces per-batch execution
        # bit-for-bit.  _chunk_fwd verifies each served forward's
        # burned seed against this list, so a stray RNG consumer in
        # the loop body forces rollback instead of silently diverging.
        # The [K,2] key array is built host-side in one upload (K
        # jax.random.PRNGKey calls would each cost a tunnel dispatch —
        # the very cost chunking amortizes); layout matches what
        # threefry_seed produces under default (x64-disabled) config:
        # the seed is truncated to 32 bits, so the high word is 0
        # (pinned by the dropout-equivalence test end-to-end).
        if any(k == Layer.DROPOUT for k, _o, _s in prog):
            seeds = [self._fwd_seed] + System.get_sys().peek_keys(
                k_batches - 1)
            keys = jnp.asarray(np.array(
                [[0, s & 0xFFFFFFFF] for s in seeds], np.uint32))
        else:
            seeds = None
            keys = jnp.broadcast_to(key, (k_batches,) + key.shape)
        # err-bit NaN sentinel (reference forward.cu:60-66, netvm.cpp:235):
        # eager mode blocks on the previous chunk's finite-status vector
        # at every chunk boundary (bounded detection latency, costs one
        # tunnel readback + pipeline overlap per chunk); the default lazy
        # mode checks only when a non-finite value materializes on the
        # host (mu/future.NAN_HOOK) — zero cost on the healthy path.
        if os.environ.get("T4_NAN_GUARD", "") == "eager" \
                and self._fin_check(blocking=True):
            return False                     # fault handled; err set
        mesh = funcs.word_mesh()
        fn = funcs.get_fused_chunk_ds(
            prog, bool(self.train), loss_op, opt, self._ndivs(),
            inp.batch_sz, float(inp._mean), float(inp._scale),
            tuple(self[0].shape), k_batches, mesh)
        lvals, hits, fins, last = fn(cp._dev_cache, cp._dev_labels,
                                     _ji32(pos), params, dws, dbs, ms, vs,
                                     keys, *(_jf32(h) for h in hyper))
        self._chunk = {
            "ds": inp, "pos0": int(pos), "batch": inp.batch_sz,
            "k": k_batches, "j": 0, "stage": "idle",
            "lvals": lvals, "hits": hits, "fins": fins, "last": last,
            "loss_op": loss_op, "opt": opt, "hyper": hyper,
            "args": (params, dws, dbs, ms, vs), "keys": keys,
            "seeds": seeds,
            # snapshot everything replay needs at DISPATCH time so a
            # topology mutation while the chunk dangles can't make
            # _chunk_abort rebuild the program against stale state
            "prog": prog, "ndivs": self._ndivs(),
            "in_shape": tuple(self[0].shape), "mesh": mesh,
            "seq": self._next_fin_seq(),
        }
        self._serve_chunk_cycle()
        return True

    def _chunk_fwd(self, inp, spec, prog) -> bool:
        """serve the next cycle's forward from the active chunk; any
        mismatch (unexpected dataset/position, incomplete previous
        cycle, topology/train-flag change, or a dropout-seed mismatch)
        rolls back first.

        The seed check is the guard against OTHER RNG consumers in the
        loop body (`randn`, `rand`, `nn.gen`, ...): the chunk's keys
        were peeked assuming the next K-1 next_key() draws all go to
        the served forwards; a stray draw shifts the LCG, this
        forward's burned seed no longer matches the precomputed run,
        and the rollback-replay restores exact per-batch semantics
        (the already-served cycles all verified their seeds)."""
        ck = self._chunk
        sig = self._fuse_sig
        expected = ck["pos0"] + ck["j"] * ck["batch"]
        if not (inp is ck["ds"] and spec is not None
                and int(spec) == expected and ck["stage"] == "idle"
                and ck["j"] < ck["k"] and sig is not None
                and sig[0] == prog and sig[1] == bool(self.train)
                and (ck["seeds"] is None
                     or self._fwd_seed == ck["seeds"][ck["j"]])):
            self._chunk_abort()
            return False
        inp._fetch_spec = None
        self._serve_chunk_cycle()
        return True

    def _serve_chunk_cycle(self):
        ck = self._chunk
        j = ck["j"]
        if j == ck["k"] - 1:
            self._chunk_apply_last()   # final batch: full stash, normal
            return                     # serving machinery takes over
        from ..mu.future import LazyIdx
        self._hit = LazyIdx(ck["hits"], j)
        self._pending = {
            "loss_op": ck["loss_op"], "opt": ck["opt"],
            "hyper": ck["hyper"], "lval": LazyIdx(ck["lvals"], j),
            "bwd_done": False, "chunk": True,
        }
        ck["stage"] = "fwd"

    def _chunk_apply_last(self):
        ck, self._chunk = self._chunk, None
        (x0, lab, outs, masks, hot, hit, lval, dout, dxs, ndws, ndbs,
         nws, nms, nvs, zdws, fin) = ck["last"]
        # retain the completed chunk (minus its final-batch stash, whose
        # activations would otherwise stay pinned after the live tensors
        # move on) as the NaN sentinel's rollback window: if a value
        # from it later materializes non-finite, _fin_fault can still
        # replay to the exact faulting batch from the dispatch snapshot
        self._fin_tail = {k: v for k, v in ck.items()
                          if k not in ("last", "lvals", "hits")}
        inp, n0 = ck["ds"], self[0]
        inp.replace_data(x0)
        inp.label_dev = lab
        n0.replace_data(inp.data_as(*n0.shape))
        self._pending = {
            "loss_op": ck["loss_op"], "opt": ck["opt"],
            "hyper": ck["hyper"], "lval": lval, "dout": dout,
            "dxs": dxs, "ndws": ndws, "ndbs": ndbs, "nws": nws,
            "nms": nms, "nvs": nvs, "zdws": zdws, "bwd_done": False,
            # final-batch fin is fins[k-1] of the retained chunk window
            # — a None here keeps the consume-time log from double-
            # reporting it as a single-cycle entry
            "fin": None, "pos": None, "seq": ck["seq"],
        }
        self._apply_fwd_stash(outs, masks, hot, hit)

    def _chunk_abort(self):
        """rollback-replay: re-run the already-served cycles through the
        single-batch fused program from the pre-chunk state so tensors
        (weights, moments, grads, activations) materialize exactly as
        per-batch execution would have left them.  Rare path — only
        out-of-cycle introspection or a broken loop pattern lands here;
        loss/hit futures already handed out keep their chunk-computed
        values (same math, scan-order float association)."""
        ck, self._chunk = self._chunk, None
        if ck is None:
            return
        self._fuse_hits = 0
        j, stage = ck["j"], ck["stage"]
        if j == 0 and stage == "idle":
            return                    # nothing served — pure discard
        res = self._chunk_replay(ck, j, want_stash=(stage != "idle"))
        if stage == "idle":
            self._pending = None
            return
        # partial cycle: regenerate its stash at the correct state so
        # the remaining words of the current cycle serve normally
        (x0, lab, outs, masks, hot, hit, lval, dout, dxs, ndws, ndbs,
         nws, nms, nvs, zdws, fin) = res
        inp, n0 = ck["ds"], self[0]
        inp.replace_data(x0)
        inp.label_dev = lab
        n0.replace_data(inp.data_as(*n0.shape))
        self._pending = {
            "loss_op": ck["loss_op"], "opt": ck["opt"],
            "hyper": ck["hyper"], "lval": lval, "dout": dout,
            "dxs": dxs, "ndws": ndws, "ndbs": ndbs, "nws": nws,
            "nms": nms, "nvs": nvs, "zdws": zdws, "fin": fin,
            "pos": ck["pos0"] + j * ck["batch"],
            "seq": self._next_fin_seq(), "bwd_done": stage == "bwd",
        }
        self._apply_fwd_stash(outs, masks, hot, hit)
        if stage == "bwd":
            self._apply_bwd(dout, dxs, ndws, ndbs)

    def _chunk_replay(self, ck, j: int, want_stash: bool):
        """replay j COMPLETE cycles of a dispatched chunk through the
        single-batch fused program from the dispatch-time snapshot and
        apply the threaded end state to the live tensors; when
        want_stash, also run cycle j itself and return its full stash
        (shared by _chunk_abort and the NaN sentinel's _fin_fault)"""
        prog = ck["prog"]             # dispatch-time snapshot, NOT the
        params, dws, dbs, ms, vs = ck["args"]  # (possibly mutated) live one
        inp, b, pos0 = ck["ds"], ck["batch"], ck["pos0"]
        cp = inp._corpus
        fn = funcs.get_fused_cycle_ds(
            prog, bool(self.train), ck["loss_op"], ck["opt"],
            ck["ndivs"], b, float(inp._mean), float(inp._scale),
            ck["in_shape"], ck.get("mesh"))
        hy = tuple(_jf32(h) for h in ck["hyper"])
        zflat = None
        for i in range(j):            # replay the COMPLETE cycles
            res = fn(cp._dev_cache, cp._dev_labels,
                     _ji32(pos0 + i * b), params, dws, dbs, ms, vs,
                     ck["keys"][i], *hy)
            nws, nms, nvs, zflat = res[11], res[12], res[13], res[14]
            params = funcs._scatter_params(prog, params, nws)
            dws, dbs = funcs._scatter_zeroed_grads(prog, params, dws,
                                                   dbs, zflat)
            ms, vs = tuple(nms), tuple(nvs)
        if j:                         # apply the threaded end state
            tr = self._trainables()
            flat_w = [w for pair in params if pair for w in pair]
            adamlike = ck["opt"] in ("adam", "adamw")
            for i, (t, s) in enumerate(tr):
                t.grad[s].replace_data(flat_w[i])
                t.grad[s + 2].replace_data(zflat[i])
                if adamlike:
                    t.mtum[s].replace_data(ms[i])
                    t.mtum[s + 2].replace_data(vs[i])
                elif t.mtum[s] is not t.grad[s]:
                    t.mtum[s].replace_data(ms[i])
        if not want_stash:
            return None
        return fn(cp._dev_cache, cp._dev_labels, _ji32(pos0 + j * b),
                  params, dws, dbs, ms, vs, ck["keys"][j], *hy)

    # =========================================================================
    # err-bit NaN sentinel: the chunked analog of the reference's
    # per-layer _check_nan + err STOP (forward.cu:60-66, t4base.h err
    # bit, netvm.cpp:235).  Each dispatched chunk carries a per-batch
    # finite-status vector (funcs.get_fused_chunk_ds fstat); the most
    # recent completed chunk is retained (_fin_tail) so a non-finite
    # value materializing on the host can still be traced to — and
    # rolled back to — the exact faulting batch.
    # =========================================================================
    def _next_fin_seq(self) -> int:
        self._fin_seq += 1
        return self._fin_seq

    def _fin_check(self, blocking: bool = False) -> bool:
        """scan every retained finite-status window in dispatch order
        (consumed single cycles, retained + active chunks, the current
        pending cycle — oldest first, so the FIRST fault wins); on a
        fault, rollback-replay to the faulting batch where a chunk
        snapshot allows it, print the per-layer trace, and set the err
        bit (the net words STOP on it, as the reference's
        netvm.cpp:235).  Returns True when a fault was found and
        handled."""
        wins = [(seq, ("single", pos, fin))
                for (seq, pos, fin) in self._fin_log]
        for ck in (self._fin_tail, self._chunk):
            if ck is not None:
                wins.append((ck["seq"], ("chunk", ck)))
        p = self._pending
        if p is not None and p.get("fin") is not None:
            wins.append((p["seq"], ("pending", p)))
        for _seq, win in sorted(wins, key=lambda w: w[0]):
            if win[0] == "single":
                _, pos, f = win
                if not blocking and hasattr(f, "is_ready") \
                        and not f.is_ready():
                    continue
                code = int(np.asarray(f))
                if code:
                    self._fin_single_fault(pos, code, advanced=True)
                    return True
                continue
            ck = win[1]
            if win[0] == "pending":
                f = ck.get("fin")
                if not blocking and hasattr(f, "is_ready") \
                        and not f.is_ready():
                    continue
                code = int(np.asarray(f))
                if code:
                    # the pending cycle's forward stash is already the
                    # live tensor state — report, no replay needed
                    self._fin_single_fault(ck.get("pos"), code,
                                           advanced=False)
                    return True
                continue
            f = ck.get("fins")
            if f is None:
                continue
            if not blocking and hasattr(f, "is_ready") \
                    and not f.is_ready():
                continue
            fa = np.asarray(f)
            ck["fins"] = fa               # cache the readback
            if not fa.any():
                continue
            # the active chunk is unserved speculation on top of the
            # fault (tail case) or IS the fault (active case): pure
            # discard either way — _fin_fault rebuilds exact state
            self._chunk = None
            self._fin_fault(ck, fa)
            return True
        return False

    def _fin_single_fault(self, pos, code: int, advanced: bool):
        """a single-cycle window (consumed arming cycle or the current
        pending cycle) produced a non-finite batch; no chunk snapshot
        exists, so report without rollback and set the err bit"""
        from ..system import System
        sys = System.get_sys()
        self._fuse_hits = 0
        self._fuse_sig = None
        self._pending = None
        self._chunk = None       # unserved speculation atop the fault
        self._fin_tail = None
        self._fin_log.clear()
        at = f" at corpus offset {pos}" if pos is not None \
            else " in the current batch"
        if code == 2:
            sys.pstr(f"\nERROR: nn#opt non-finite weights after the "
                     f"optimizer step{at}")
        else:
            sys.pstr(f"\nERROR: nn#forward non-finite{at}")
        if advanced:
            sys.pstr("\n(state has advanced past the faulting batch; "
                     "rerun with trace=1 for per-batch checks)")
        self._trace_pass("forward", range(self.numel - 1),
                         nan_check=True)
        self.err = 1

    def _fin_fault(self, ck, fa):
        """a dispatched chunk produced a non-finite batch: report it,
        replay to the faulting batch, run its forward with the
        per-layer trace (prints the first NaN layer exactly as the
        reference's traced forward does) and set the err bit"""
        from ..system import System
        sys = System.get_sys()
        fwd_bad = np.nonzero(fa == 1)[0]
        w_bad = np.nonzero(fa == 2)[0]
        # fault batch = the first forward with a non-finite loss — the
        # same batch the reference's per-layer check would flag; a
        # weight explosion (code 2, optimizer step) is reported as
        # itself, since the reference only sees it one forward later
        i = int(fwd_bad[0]) if fwd_bad.size else int(w_bad[0])
        b, pos = ck["batch"], ck["pos0"] + int(
            (fwd_bad[0] if fwd_bad.size else w_bad[0])) * ck["batch"]
        self._fuse_hits = 0
        self._fuse_sig = None
        self._pending = None
        self._fin_tail = None
        self._fin_log.clear()
        if w_bad.size and (not fwd_bad.size or w_bad[0] < fwd_bad[0]):
            sys.pstr(f"\nERROR: nn#opt non-finite weights after the "
                     f"optimizer step at corpus offset "
                     f"{ck['pos0'] + int(w_bad[0]) * b}")
        if i == 0:
            sys.pstr(f"\nERROR: non-finite at the retained window's "
                     f"first batch (offset {pos}) — the fault may "
                     f"predate it; rerun with trace=1 or "
                     f"T4_NAN_GUARD=eager to localize")
        res = self._chunk_replay(ck, i, want_stash=True)
        (x0, lab, outs, masks, hot, hit, *_rest) = res
        inp, n0 = ck["ds"], self[0]
        inp.replace_data(x0)
        inp.label_dev = lab
        n0.replace_data(inp.data_as(*n0.shape))
        self._apply_fwd_stash(outs, masks, hot, hit)
        sys.pstr(f"\nERROR: nn#forward non-finite at corpus offset "
                 f"{pos} (batch {i} of the chunk at {ck['pos0']}); "
                 f"state rolled back to the faulting batch")
        self._trace_pass("forward", range(self.numel - 1),
                         nan_check=True)
        self.err = 1

    _alarm_busy = False

    @classmethod
    def _nan_alarm(cls):
        """mu/future.NAN_HOOK: a non-finite scalar materialized on the
        host — scan live models' retained chunk windows and convert
        the first fault found into the err-bit stop (rollback + layer
        trace).  Zero cost on healthy reads; re-entrancy guarded (the
        fault path itself reads device scalars)."""
        if cls._alarm_busy:
            return
        cls._alarm_busy = True
        try:
            for m in list(cls._live or ()):
                if (m._chunk is not None or m._fin_tail is not None
                        or m._fin_log
                        or (m._pending is not None
                            and m._pending.get("fin") is not None)):
                    if m._fin_check(blocking=True):
                        return
        finally:
            cls._alarm_busy = False

    def _trace_pass(self, name: str, order, nan_check: bool | None = None):
        """per-layer trace (reference forward.cu:44-51/backprop.cu:41-47).
        The forward pass checks each layer output for NaN whenever the
        trace runs — the reference's `if (*_trace && _check_nan(out))`
        (forward.cu:60-66) — printing the faulting layer, setting the
        err bit (net words STOP on it) and breaking; backprop keeps the
        check at trace>1 (the reference's backprop has none)."""
        from ..system import System
        from ..ops import engine
        sys = System.get_sys()
        if nan_check is None:
            nan_check = name == "forward" or sys.trace > 1
        sys.pstr(f"\nModel::{name} trace {{")
        for i in order:
            t_in, t_out = self[i], self[i + 1]
            s = engine.t_sum(t_in.ensure_data()) / t_in.N() / max(t_in.C(), 1)
            sys.pstr(
                f"\n  {i:3d}> {Model.nname(t_in.grad_fn)} "
                f"[{t_in.N():2d},{t_in.H():2d},{t_in.W():2d},{t_in.C():2d}]"
                f" Σ/n={s:6.2f} p={float(t_in.xparm):6.3f}"
                f" => out[{t_out.N():2d},{t_out.H():2d},"
                f"{t_out.W():2d},{t_out.C():2d}]")
            if nan_check and engine.has_nan(t_out.ensure_data()):
                sys.pstr(f"\nERROR: nn#{name} NaN in "
                         f"{Model.nname(t_in.grad_fn)}")
                self.err = 1
                break
        sys.pstr("\n}\n")

    # =========================================================================
    # backprop (reference backprop.cu)
    # =========================================================================
    def broadcast(self, tgt: Tensor) -> "Model":
        self.fuse_break()                     # _hot swap mid-cycle
        out = self[-1]
        N, HWC = out.N(), out.HWC()
        if self._hot is None:
            self._hot = self._T4(N, 1, HWC, 1)
        v = tgt.numpy().reshape(N, -1)[:, :1]
        self._hot.set_numpy(np.repeat(v, HWC, axis=1))
        return self

    def backprop(self, tgt: Tensor | None = None) -> "Model":
        if tgt is None:
            if self._hot is None:
                self._err("nn#backprop missing onehot vector?")
                return self
            tgt = self._hot
        out = self[-1]
        if out.numel != tgt.numel:
            self._err(f"Model#bprep: onehot wrong shape {tgt.shape} "
                      f"!= {out.shape}")
            self.err = 1
            return self
        p = self._pending
        if p is not None and tgt is self._hot and not p["bwd_done"]:
            if p.get("chunk"):
                # trace-chunk serve: grads for this batch exist only in
                # the chunk program; tensor state materializes at the
                # chunk's final batch (or on chunk_sync introspection)
                p["bwd_done"] = True
                self._cycle.append("bwd")
                if self._chunk is not None:
                    self._chunk["stage"] = "bwd"
                return self
            # macro-op fusion: the fused cycle already computed the
            # backward — apply its slice instead of dispatching
            dout, dxs, ndws, ndbs = (p["dout"], p["dxs"],
                                     p["ndws"], p["ndbs"])
            p["bwd_done"] = True
            self._cycle.append("bwd")
            self._apply_bwd(dout, dxs, ndws, ndbs)
            return self
        if p is not None:                     # deviation: drop the stash
            self._pending = None
            self.fuse_break()
        self._chunk_abort()                   # outs/params must be current
        prog = self._program()
        bwd = funcs.get_backward(prog, self[0].shape, bool(self.train))
        outs = tuple(self[i + 1].ensure_data() for i in range(self.numel - 1))
        masks = self._gather_masks()
        dws, dbs = self._gather_grads()
        dout, dxs, ndws, ndbs = bwd(
            tgt.ensure_data(), self[0].ensure_data(), outs,
            self._params(), masks, dws, dbs)
        self._cycle.append("bwd")
        self._apply_bwd(dout, dxs, ndws, ndbs)
        return self

    def _apply_bwd(self, dout, dxs, ndws, ndbs):
        self[-1].replace_data(dout)
        for j in range(self.numel - 1):
            self[j].replace_data(dxs[j])
            t_in = self[j]
            if t_in.grad[2] is not None:
                t_in.grad[2].replace_data(ndws[j])
            if t_in.grad[3] is not None:
                t_in.grad[3].replace_data(ndbs[j])
        from ..system import System
        if System.get_sys().trace:
            self._trace_pass("backprop", range(self.numel - 2, -1, -1))

    def _gather_masks(self):
        masks = []
        for i in range(self.numel - 1):
            t_in = self[i]
            kind = t_in.grad_fn
            if kind == Layer.BATCHNM:
                xhat = t_in.grad[4].ensure_data()
                C = t_in.C()
                rvar = t_in.mtum[4].ensure_data()[:C]
                masks.append((xhat, rvar))
            elif kind in funcs._MASKED:
                masks.append(t_in.grad[4].ensure_data())
            else:
                masks.append(None)
        return tuple(masks)

    def _gather_grads(self):
        """accumulators in their rank-4 STORAGE shapes — backward_segment
        reshapes increments to match inside the jit, so no host-side
        reshape dispatch happens per batch"""
        global _ZERO1
        if _ZERO1 is None:
            _ZERO1 = jnp.zeros((1,), jnp.float32)
        dws, dbs = [], []
        for i in range(self.numel - 1):
            t_in = self[i]
            if t_in.grad[2] is not None:
                dws.append(t_in.grad[2].ensure_data())
                dbs.append(t_in.grad[3].ensure_data())
            else:
                dws.append(_ZERO1)
                dbs.append(_ZERO1)
        return tuple(dws), tuple(dbs)

    # =========================================================================
    # gradient descent (reference gradient.cu)
    # =========================================================================
    def _trainables(self):
        """[(w, dw, mslot_w, vslot_w, ndiv), (b, db, mslot_b, vslot_b, 1)]"""
        out = []
        for i in range(self.numel - 1):
            t_in = self[i]
            if t_in.grad_fn in (Layer.CONV, Layer.DCONV, Layer.LINEAR,
                                Layer.BATCHNM, Layer.ATTN, Layer.MOE,
                                Layer.LNORM, Layer.EMBED, Layer.PROJ) \
                    and t_in.grad[0] is not None:
                out.append((t_in, 0))        # weight slot
                out.append((t_in, 1))        # bias slot
        return out

    def grad_alloc(self, op: int):
        for t_in, slot in self._trainables():
            g = t_in.grad[slot]
            if op in (Optimizer.SGD,):
                t_in.mtum[slot] = g
            elif t_in.mtum[slot] is None or t_in.mtum[slot] is g:
                t_in.mtum[slot] = self._T4(*g.shape)
                if op in (Optimizer.ADAM, Optimizer.ADAMW):
                    t_in.mtum[slot + 2] = self._T4(*g.shape)
        self._opt_inited = True

    def grad_zero(self):
        self.fuse_break()
        for t_in, slot in self._trainables():
            dg = t_in.grad[slot + 2]
            if dg is not None:
                dg.replace_data(jnp.zeros(dg.shape, jnp.float32))

    def _opt_apply(self, op: int, step_fn, *hyper):
        if not self._opt_inited:
            self.grad_alloc(op)
        self._iter += 1
        if not self.train:
            return self
        tr = self._trainables()
        ws = [t.grad[s].ensure_data() for t, s in tr]
        dws = [t.grad[s + 2].ensure_data() for t, s in tr]
        ms = [t.mtum[s].ensure_data() for t, s in tr]
        if op in (Optimizer.ADAM, Optimizer.ADAMW):
            vs = [t.mtum[s + 2].ensure_data() for t, s in tr]
            nws, ndws, nms, nvs = step_fn(ws, dws, ms, vs, *hyper)
            for (t, s), w, dw, m, v in zip(tr, nws, ndws, nms, nvs):
                t.grad[s].replace_data(w)
                t.grad[s + 2].replace_data(dw)
                t.mtum[s].replace_data(m)
                t.mtum[s + 2].replace_data(v)
        else:
            nws, ndws, nms = step_fn(ws, dws, ms, *hyper)
            for (t, s), w, dw, m in zip(tr, nws, ndws, nms):
                t.grad[s].replace_data(w)
                t.grad[s + 2].replace_data(dw)
                if t.mtum[s] is not t.grad[s]:
                    t.mtum[s].replace_data(m)
        return self

    def _ndivs(self):
        """SGD batch-divisor quirk: g.N() of each weight tensor"""
        out = []
        for t, s in self._trainables():
            g = t.grad[s]
            out.append(float(g.N() if g.rank == 4 else 1))
        return tuple(out)

    def _try_fused_opt(self, opt: str, hyper: tuple) -> bool:
        """apply the fused cycle's speculative optimizer results if the
        actual call matches the prediction (same opt word, same
        hyperparameters, backward already consumed)"""
        p = self._pending
        if (p is None or not p["bwd_done"] or p["opt"] != opt
                or p["hyper"] != hyper):
            return False
        self._pending = None
        self._iter += 1
        if p.get("chunk"):
            # trace-chunk serve: weights already advanced inside the
            # chunk program; host tensors materialize at the final batch
            ck = self._chunk
            if ck is not None:
                ck["j"] += 1
                ck["stage"] = "idle"
            self._fuse_hits += 1
            self._note_opt(opt, hyper)
            return True
        if p.get("fin") is not None:
            # retain the consumed cycle's finite status: exact fault
            # attribution for the chunk-arming single cycles (the NaN
            # sentinel scans these oldest-first, _fin_check)
            self._fin_log.append((p["seq"], p.get("pos"), p["fin"]))
            del self._fin_log[:-8]
        adamlike = opt in ("adam", "adamw")
        for i, (t, s) in enumerate(self._trainables()):
            t.grad[s].replace_data(p["nws"][i])
            t.grad[s + 2].replace_data(p["zdws"][i])
            if adamlike:
                t.mtum[s].replace_data(p["nms"][i])
                t.mtum[s + 2].replace_data(p["nvs"][i])
            elif t.mtum[s] is not t.grad[s]:
                t.mtum[s].replace_data(p["nms"][i])
        self._fuse_hits += 1
        self._note_opt(opt, hyper)
        return True

    def sgd(self, lr: float, b: float = 0.0) -> "Model":
        momentum = abs(b) > Config.DU_EPS
        opt = "sgdm" if momentum else "sgd"
        hyper = (float(lr), float(b), 0.0, 0.0)
        if self._try_fused_opt(opt, hyper):
            return self
        self._chunk_abort()                   # grads must be current
        self._pending = None
        op = Optimizer.SGDM if momentum else Optimizer.SGD
        fn = funcs.get_sgd(self._ndivs(), momentum)
        r = self._opt_apply(op, fn, _jf32(lr), _jf32(b))
        self._note_opt(opt, hyper)
        return r

    def adam(self, lr: float, b1: float = 0.9, b2: float = 0.999) -> "Model":
        hyper = (float(lr), float(b1), float(b2), 0.0)
        if self._try_fused_opt("adam", hyper):
            return self
        self._chunk_abort()                   # grads must be current
        self._pending = None
        fn = funcs.get_adam(False)
        r = self._opt_apply(Optimizer.ADAM, fn, _jf32(lr),
                            _jf32(b1), _jf32(b2), _jf32(0.0))
        self._note_opt("adam", hyper)
        return r

    def adamw(self, lr: float, wd: float = 0.01, b1: float = 0.9,
              b2: float = 0.999) -> "Model":
        hyper = (float(lr), float(b1), float(b2), float(wd))
        if self._try_fused_opt("adamw", hyper):
            return self
        self._chunk_abort()                   # grads must be current
        self._pending = None
        fn = funcs.get_adam(True)
        r = self._opt_apply(Optimizer.ADAMW, fn, _jf32(lr),
                            _jf32(b1), _jf32(b2), _jf32(wd))
        self._note_opt("adamw", hyper)
        return r

    # =========================================================================
    # loss & metrics (reference loss.cpp)
    # =========================================================================
    def onehot(self, t: Tensor | None = None) -> Tensor:
        if t is None:
            if self._hot is None:
                self._err("Model.onehot not provided by dataset, "
                          "use nn.onehot= to setup!")
                return self[-1]
            return self._hot
        out = self[-1]
        self.fuse_break()                     # _hot swap mid-cycle
        if self._hot is not None:
            self._mmu.free_obj(self._hot)
        elif t.N() != out.N() or t.HWC() != out.HWC():
            self._err(f"Model.onehot dimension is not "
                      f"[{out.N()},1,{out.HWC()},1]")
            return t
        self._hot = t
        self._hit = self.hit(True)
        return self._hot

    def onehot_from_dataset(self, dset) -> Tensor:
        out = self[-1]
        E = out.HWC()
        if self._hot is None:
            self._hot = self._T4(out.N(), 1, E, 1)
        ld = getattr(dset, "label_dev", None)
        if ld is not None and ld.shape[0] == out.N():
            labels = ld                    # device slice — no upload
        else:
            labels = jnp.asarray(dset.label[:out.N()], dtype=jnp.int32)
        self._hot.replace_data(funcs.onehot_fn(labels, E))
        return self._hot

    def hit(self, recalc: bool = False) -> int:
        if not recalc:
            from ..mu.future import LazyIdx
            if isinstance(self._hit, LazyIdx):
                self._hit = self._hit.vec[self._hit.i]
            return int(self._hit)      # syncs only when the word reads it
        if self._hot is None:
            return 0
        # async device argmax-compare; host conversion deferred
        return funcs.hit_fn(self[-1].ensure_data(),
                            self._hot.ensure_data())

    def hit_dev(self):
        """device scalar, NO host sync — wrapped as a stack future"""
        return self._hit

    def loss_dev(self, op: int, tgt: Tensor | None = None):
        """device scalar loss, NO host sync (the nn.loss words wrap this
        in a future so FOR/NEXT epochs pipeline past the readback)"""
        if tgt is None:
            tgt = self._hot
        out = self[-1]
        if tgt is None or out.numel != tgt.numel:
            self._err("nn::loss shape mismatch")
            return 0.0
        name = Loss.NAMES[op].lower()
        self._cycle.append("loss:" + name)
        p = self._pending
        if p is not None and tgt is self._hot and name == p["loss_op"]:
            return p["lval"]                  # fused cycle's loss slice
        if self._chunk is not None or (p is not None and p.get("chunk")):
            # out-of-pattern loss during a trace chunk: materialize the
            # real per-batch state first, then retry the stash
            self._chunk_abort()
            p = self._pending
            if p is not None and tgt is self._hot \
                    and name == p["loss_op"]:
                return p["lval"]
        return funcs.loss_fn(name, out.ensure_data(), tgt.ensure_data())

    def loss(self, op: int, tgt: Tensor | None = None) -> float:
        return float(self.loss_dev(op, tgt))


import weakref  # noqa: E402  (registry wiring, after the class body)

Model._live = weakref.WeakSet()
from ..mu import future as _future  # noqa: E402
_future.NAN_HOOK = Model._nan_alarm
