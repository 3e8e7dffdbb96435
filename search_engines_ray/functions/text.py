"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token statistics, document fingerprinting. All
vectorize per batch; the heuristics are deterministic (no models in this
environment) and DuckDB-mirrorable where used as oracle-checked queries.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..analysis.tokenizer import LUCENE_STOP_WORDS, simple_tokenize

# function-word profiles for a tiny trigram-free language-ID heuristic
_LANG_PROFILES = {
    "en": frozenset("the of and to a in is it you that he was for on are".split()),
    "de": frozenset("der die das und ist ich nicht ein zu mit sich auf für".split()),
    "fr": frozenset("le la les et de un une est je ne pas pour dans".split()),
    "es": frozenset("el la los las y de un una es en que no por con".split()),
}

_BPE_ISH_RE = re.compile(r"[a-z]+|[0-9]|[^a-z0-9\s]")


def round6(x) -> np.ndarray:
    """Half-away-from-zero 6-dp rounding — matches the DuckDB oracle
    expression ``floor(x*1000000 + 0.5)/1000000`` bit for bit (numpy/
    Python ``round`` banker's-rounds, DuckDB rounds half away)."""
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) / 1e6


class LanguageId:
    """Function-word-ratio language ID; ``unknown`` under ``min_hits``."""

    def __init__(self, text_col: str = "text", min_hits: int = 1):
        self.text_col = text_col
        self.min_hits = min_hits

    def classify(self, text: str) -> str:
        toks = simple_tokenize(text or "")
        if not toks:
            return "unknown"
        best, best_hits = "unknown", self.min_hits - 1
        for lang, words in _LANG_PROFILES.items():
            hits = sum(1 for t in toks if t in words)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def __call__(self, b: pa.Table) -> pa.Table:
        langs = [self.classify(t) for t in b[self.text_col].to_pylist()]
        return b.append_column("detected_lang", pa.array(langs, pa.string()))


def language_id(ds, text_col: str = "text"):
    # stateless task + process-global classifier (profiles are tiny but
    # the pattern matters: no fixed pool width capping throughput)
    from ..util import proc_cached

    def fn(b: pa.Table) -> pa.Table:
        clf = proc_cached(("langid", text_col),
                          lambda: LanguageId(text_col=text_col))
        return clf(b)

    return ds.map_batches(fn, batch_format="pyarrow")


def quality_batch(b: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc quality signals (all float64, rounded to 6 dp so the
    DuckDB oracle hashes identically): n_tokens, alpha_ratio,
    stopword_ratio, mean_token_len."""
    texts = b[text_col].to_pylist()
    n_tok = np.empty(len(texts), dtype=np.int64)
    alpha = np.empty(len(texts), dtype=np.float64)
    stopr = np.empty(len(texts), dtype=np.float64)
    mtl = np.empty(len(texts), dtype=np.float64)
    for i, t in enumerate(texts):
        t = t or ""
        toks = simple_tokenize(t)
        n_tok[i] = len(toks)
        # ascii-alpha on purpose: mirrors the DuckDB oracle expression
        # regexp_replace(text, '[^a-zA-Z]', '', 'g')
        n_alpha = sum(1 for c in t if ("a" <= c <= "z") or ("A" <= c <= "Z"))
        alpha[i] = n_alpha / len(t) if t else 0.0
        stopr[i] = (sum(1 for w in toks if w in LUCENE_STOP_WORDS) / len(toks)
                    if toks else 0.0)
        mtl[i] = (sum(map(len, toks)) / len(toks)) if toks else 0.0
    out = pa.table({c: b[c] for c in b.column_names})
    out = out.append_column("n_tokens", pa.array(n_tok))
    out = out.append_column("alpha_ratio", pa.array(round6(alpha)))
    out = out.append_column("stopword_ratio", pa.array(round6(stopr)))
    out = out.append_column("mean_token_len", pa.array(round6(mtl)))
    return out


def quality_scores(ds, text_col: str = "text"):
    return ds.map_batches(lambda b: quality_batch(b, text_col),
                          batch_format="pyarrow")


def token_stats(ds, text_col: str = "text"):
    """Whitespace tokens + BPE-ish subword count per doc."""
    def fn(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        ws = np.array([len((t or "").split()) for t in texts], dtype=np.int64)
        bpe = np.array([len(_BPE_ISH_RE.findall((t or "").lower()))
                        for t in texts], dtype=np.int64)
        out = pa.table({c: b[c] for c in b.column_names})
        out = out.append_column("ws_tokens", pa.array(ws))
        out = out.append_column("bpe_ish_tokens", pa.array(bpe))
        return out
    return ds.map_batches(fn, batch_format="pyarrow")


_B = 1099511628211       # FNV-ish rolling base
_MOD = (1 << 61) - 1


def _rolling_hashes(tokens: list[str], w: int) -> np.ndarray:
    """Rabin-Karp rolling hash over word ``w``-grams."""
    import hashlib
    hs = [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big") % _MOD
          for t in tokens]
    if len(hs) < w:
        hs = hs + [0] * (w - len(hs))
    out = np.empty(max(len(hs) - w + 1, 1), dtype=np.uint64)
    cur = 0
    power = pow(_B, w - 1, _MOD)
    for i, h in enumerate(hs):
        cur = (cur * _B + h) % _MOD
        if i >= w:
            cur = (cur - hs[i - w] * pow(_B, w, _MOD)) % _MOD
        if i >= w - 1:
            out[i - w + 1] = cur
    return out


def doc_fingerprint(ds, text_col: str = "text", id_col: str = "doc_id",
                    window: int = 8, keep_mod: int = 16):
    """Winnowing-style fingerprints: rolling-hash word 8-grams, keep
    hashes ≡ 0 (mod keep_mod) plus the minimum (never-empty guarantee).
    → Dataset (doc_id, fingerprint: list<uint64>)."""
    def fn(b: pa.Table) -> pa.Table:
        ids, fps = b[id_col].to_pylist(), []
        for t in b[text_col].to_pylist():
            toks = simple_tokenize(t or "")
            if not toks:
                fps.append([])
                continue
            hs = _rolling_hashes(toks, window)
            sel = hs[hs % keep_mod == 0]
            if sel.size == 0:
                sel = hs[[int(np.argmin(hs))]]
            fps.append(sorted(set(int(x) for x in sel)))
        return pa.table({id_col: pa.array(ids),
                         "fingerprint": pa.array(fps, pa.list_(pa.uint64()))})
    return ds.map_batches(fn, batch_format="pyarrow")
