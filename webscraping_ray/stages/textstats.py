"""Text-analysis stages: language-ID, quality scoring, token counting,
document fingerprinting.  All vectorized map_batches stages over a
``text`` column (first-class training-data-pipeline components)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_WS_RE = re.compile(r'\s+')
# BPE-ish pre-tokenizer: word pieces, numbers, punctuation runs
# (GPT-2-style contraction-aware split, public pattern shape)
_BPE_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?\d+| ?[^\sA-Za-z\d]+|\s+(?!\S)|\s+")
_TOKEN_RE = re.compile(r'\w+', re.UNICODE)
_PUNCT_RE = re.compile(r'[^\w\s]')

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    'en': {'the', 'and', 'of', 'to', 'a', 'in', 'is', 'it', 'you', 'that',
           'he', 'was', 'for', 'on', 'are', 'with', 'as', 'his', 'they'},
    'de': {'der', 'die', 'das', 'und', 'ist', 'ich', 'nicht', 'ein', 'mit',
           'sie', 'auf', 'für', 'von', 'zu', 'den', 'im', 'dem'},
    'fr': {'le', 'la', 'les', 'et', 'est', 'je', 'pas', 'un', 'une', 'avec',
           'pour', 'que', 'des', 'du', 'dans', 'il', 'au'},
    'es': {'el', 'la', 'los', 'las', 'y', 'es', 'no', 'un', 'una', 'con',
           'para', 'que', 'de', 'en', 'por', 'se', 'del'},
    'it': {'il', 'la', 'le', 'e', 'è', 'non', 'un', 'una', 'con', 'per',
           'che', 'di', 'in', 'del', 'si', 'sono'},
}


def whitespace_token_count(text: str) -> int:
    t = (text or '').strip()
    return len(_WS_RE.split(t)) if t else 0


def bpe_ish_token_count(text: str) -> int:
    return len(_BPE_RE.findall(text or ''))


class TokenCount:
    """doc → whitespace token count + BPE-ish token count."""

    def __init__(self, text_col: str = 'text', id_col: str = 'doc_id'):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        return pa.table({
            self.id_col: batch.column(self.id_col),
            'n_tokens': pa.array([whitespace_token_count(t) for t in texts],
                                 pa.int64()),
            'n_bpe_tokens': pa.array([bpe_ish_token_count(t) for t in texts],
                                     pa.int64()),
        })


class QualityScore:
    """Heuristic document-quality features:

    n_chars, n_tokens, n_unique_tokens, punct_ratio (x1000, int),
    stopword_ratio (x1000, int), mean_token_len (x1000, int).
    Integer-scaled so downstream comparisons are exact.
    """

    def __init__(self, text_col: str = 'text', id_col: str = 'doc_id',
                 stopwords=None):
        self.text_col = text_col
        self.id_col = id_col
        self.stopwords = stopwords or _LANG_PROFILES['en']

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        n_chars, n_tok, n_uniq, punct, stop, mean_len = [], [], [], [], [], []
        for t in texts:
            t = t or ''
            toks = _TOKEN_RE.findall(t.lower())
            n_chars.append(len(t))
            n_tok.append(len(toks))
            n_uniq.append(len(set(toks)))
            punct.append(round(1000 * len(_PUNCT_RE.findall(t)) / max(1, len(t))))
            stop.append(round(1000 * sum(1 for w in toks if w in self.stopwords)
                              / max(1, len(toks))))
            mean_len.append(round(1000 * (sum(map(len, toks)) / len(toks))) if toks else 0)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            'n_chars': pa.array(n_chars, pa.int64()),
            'n_tokens': pa.array(n_tok, pa.int64()),
            'n_unique_tokens': pa.array(n_uniq, pa.int64()),
            'punct_ratio_1k': pa.array(punct, pa.int64()),
            'stopword_ratio_1k': pa.array(stop, pa.int64()),
            'mean_token_len_1k': pa.array(mean_len, pa.int64()),
        })


class LangId:
    """Stopword-profile language-ID heuristic (deterministic).

    Scores each language by stopword hits; ties break alphabetically;
    no hits → 'unk'.
    """

    def __init__(self, text_col: str = 'text', id_col: str = 'doc_id'):
        self.text_col = text_col
        self.id_col = id_col
        self.profiles = sorted(_LANG_PROFILES.items())

    def predict(self, text: str) -> str:
        toks = _TOKEN_RE.findall((text or '').lower())
        if not toks:
            return 'unk'
        best_lang, best = 'unk', 0
        for lang, words in self.profiles:
            score = sum(1 for t in toks if t in words)
            if score > best:
                best, best_lang = score, lang
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        return pa.table({
            self.id_col: batch.column(self.id_col),
            'pred_lang': pa.array([self.predict(t) for t in texts], pa.string()),
        })


class Fingerprint:
    """Rolling-hash (Rabin-Karp style) document fingerprints.

    Emits the full-document polynomial hash (mod 2^61-1) plus the
    minimum k-gram rolling hash (mod 2^31-1) — a deterministic
    near-dup-robust fingerprint.  Both hash over unicode CODEPOINTS,
    and both are exactly recomputable in DuckDB SQL (the
    ``fingerprints`` oracle): the gram modulus is 31-bit so the
    vectorized Horner recurrence (value < 2^21, state*B < 2^51) never
    overflows uint64 — a 61-bit gram hash would need 128-bit
    intermediates, which numpy lacks.
    """

    B = 1_000_003
    MOD = (1 << 61) - 1       # doc_hash modulus (collision-resistant id)
    GRAM_MOD = (1 << 31) - 1  # k-gram modulus (min-sketch; 31-bit ok)

    def __init__(self, text_col: str = 'text', id_col: str = 'doc_id',
                 k: int = 8, window: int = 16):
        self.text_col = text_col
        self.id_col = id_col
        self.k = k
        self.window = window

    def doc_hash(self, t: str) -> int:
        h = 0
        for ch in t:
            h = (h * self.B + ord(ch)) % self.MOD
        return h

    def winnow_min(self, t: str) -> int:
        k = self.k
        if len(t) < k:
            return self.doc_hash(t)
        # codepoints, vectorized (utf-32-le == one uint32 per codepoint)
        data = np.frombuffer(t.encode('utf-32-le'), dtype=np.uint32).astype(np.uint64)
        n_win = len(data) - k + 1
        # Horner over the window dimension: k passes, no per-window loop
        g = np.zeros(n_win, dtype=np.uint64)
        B = np.uint64(self.B % self.GRAM_MOD)
        M = np.uint64(self.GRAM_MOD)
        for j in range(k):
            g = (g * B + data[j:j + n_win]) % M
        return int(g.min())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        return pa.table({
            self.id_col: batch.column(self.id_col),
            'doc_hash': pa.array([self.doc_hash(t or '') for t in texts],
                                 pa.int64()),
            'min_gram_hash': pa.array([self.winnow_min(t or '') for t in texts],
                                      pa.int64()),
        })
