"""`words` vocabulary parity audit against the reference build
(VERDICT r3 item 10): extract every CODE/IMMD registration the
reference actually compiles (honoring its #if blocks — the `#if 0
words TODO` stubs at eforth.cpp:421-428 are OUT, `u< u>` at 243-244
are IN) and require that our dictionary contains them ALL, in the same
registration order, with every extra word accounted for on the
documented extension list (docs/WORDS.md §Parity).

Runs only where /root/reference is present (this container)."""
import io
import os
import re

import pytest

REF = "/root/reference/src/vm"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not available")

# deliberate extras — every one documented in docs/WORDS.md §Parity
EXTENSION_WORDS = {
    # reference's own `#if 0 words TODO` list, implemented for real
    # (eforth.cpp:421-428; u</u> are also live at 243-244)
    "power", "?do", "roll", "within",
    # multitask scaffold realized (reference declares behind
    # DO_MULTITASK, compiled out — vm.h:62-79)
    "task", "rank", "start", "join", "lock", "unlock", "send", "recv",
    "bcast", "pull",
    # dataset position words (checkpoint/resume support)
    "ds.seek", "ds.tell",
    # profiling (jax.profiler bridge) + TB hparams plugin (reference
    # ships hparam.h unwired)
    "prof.start", "prof.stop", ".hparam",
    # NN extension tier (reference roadmap README.md:702-720)
    "nn.attn", "nn.embed", "nn.moe", "nn.proj", "layernorm",
    "nn.train", "nn.gen", "nn.pipe",
    # two-phase model restore helper (reference injects the phase-2
    # word inline from aio_model.cpp:183-204; ours is a visible word)
    "nn.load",
}


def _extract(path):
    """registration-ordered CODE/IMMD names, with a minimal
    preprocessor: #if 0 blocks excluded, T4_DO_* treated as enabled
    (the default ten4_config.h build), //-comments stripped"""
    TRUE = {"T4_DO_OBJ", "T4_DO_NN", "T4_DO_TB", "T4_DO_MATH"}
    stack = [True]
    out = []
    for ln in open(path):
        t = ln.strip()
        if t.startswith("#if"):
            if t.startswith("#ifdef"):
                val = t.split()[1] in TRUE
            else:
                expr = re.sub(r"//.*|/\*.*?\*/", "",
                              t[3:]).strip("() \t")
                toks = re.findall(r"[A-Za-z_0-9]+", expr)
                val = bool(toks) and all(
                    x in TRUE or (x.isdigit() and int(x)) for x in toks)
            stack.append(stack[-1] and val)
        elif t.startswith("#else"):
            stack[-1] = (not stack[-1]) and stack[-2]
        elif t.startswith("#endif"):
            stack.pop()
        elif stack[-1]:
            code = ln.split("//")[0]
            for m in re.finditer(r'\b(?:CODE|IMMD)\("((?:\\.|[^"\\])+)"',
                                 code):
                out.append(m.group(1).replace('\\"', '"')
                           .replace("\\\\", "\\").replace("\\n", "\n"))
    return out


def _reference_words():
    ws = []
    for f in ("eforth.cpp", "tenvm.cpp", "netvm.cpp"):
        ws += _extract(os.path.join(REF, f))
    return ws


def test_every_reference_word_present_in_order(t4):
    ref = _reference_words()
    assert len(ref) > 250, "extractor regression"
    ours = [c.name for c in t4.sys.mu.dict.words]
    our_set = set(ours)
    missing = [w for w in ref if w not in our_set]
    assert not missing, f"reference words missing: {missing}"
    # registration ORDER parity: `words` lists both dictionaries in the
    # same relative order (matters for FIND shadowing semantics)
    ref_set = set(ref)
    ours_common = [w for w in ours if w in ref_set]
    ref_common = [w for w in ref if w in our_set]
    assert ours_common == ref_common, "registration order diverges"


def test_every_extra_word_is_documented(t4):
    ref = set(_reference_words())
    ours = [c.name for c in t4.sys.mu.dict.words]
    extras = {w for w in ours if w not in ref and not w.startswith("\n")}
    undocumented = extras - EXTENSION_WORDS
    assert not undocumented, \
        f"extra words not on the documented extension list: " \
        f"{sorted(undocumented)}"
    gone = EXTENSION_WORDS - set(ours)
    assert not gone, f"documented extensions missing: {sorted(gone)}"
    # keep docs/WORDS.md honest: every extension word must appear there
    doc = open("docs/WORDS.md").read()
    undoc = [w for w in sorted(EXTENSION_WORDS) if w not in doc]
    assert not undoc, f"extension words absent from docs/WORDS.md: {undoc}"
