"""Text analysis operators over a documents table: deterministic tokenization,
token counting, quality scoring, language ID, document fingerprinting.

All are vectorized ``map_batches`` bodies (regexes compiled once per actor in
the stage classes below — the ST1 pattern, ref core/streaming_pipeline.py:229-257).
No ML models: language ID is an n-gram/stopword heuristic, tokenization is a
whitespace + hash scheme, so everything is bit-deterministic and
SQL-cross-checkable where expressible.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from tsrollup.hashing import fnv1a64_bytes

VOCAB = 50257
_WS = re.compile(r"\S+")
# BPE-ish pre-tokenizer: word pieces, numbers, punctuation runs (public GPT-2
# pre-tokenizer shape, simplified and dependency-free)
_BPEISH = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+")


def ws_tokens(text: str) -> list[str]:
    return _WS.findall(text or "")


def tokenize_ids(text: str) -> np.ndarray:
    """Deterministic token ids: whitespace tokens hashed into [0, VOCAB)."""
    return np.array(
        [fnv1a64_bytes(t.encode()) % VOCAB for t in ws_tokens(text)], dtype=np.int32
    )


def count_tokens_batch(df: pd.DataFrame, text_col: str = "text") -> pd.Series:
    """n_tok per row = count of \\S+ runs (SQL: len(regexp_extract_all(text,'\\S+')))."""
    return df[text_col].fillna("").str.count(r"\S+").astype("int64")


def bpeish_count_batch(df: pd.DataFrame, text_col: str = "text") -> pd.Series:
    """Token count under the BPE-ish regex pre-tokenizer."""
    return df[text_col].fillna("").str.count(_BPEISH).astype("int64")


# --- quality scoring -------------------------------------------------------

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by".split()
)


def quality_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Length / punctuation / stopword / uppercase ratio quality signals.

    Every measure is defined so an ANSI-SQL oracle can reproduce it exactly
    (integer counts; ratios as count pairs, rounded only at presentation).
    """
    s = df[text_col].fillna("")
    n_chars = s.str.len().astype("int64")
    n_tok = s.str.count(r"\S+").astype("int64")
    n_alpha = s.str.count(r"[A-Za-z]").astype("int64")
    n_digit = s.str.count(r"[0-9]").astype("int64")
    n_punct = s.str.count(r"[!-/:-@\[-`{-~]").astype("int64")
    n_upper = s.str.count(r"[A-Z]").astype("int64")
    n_space = s.str.count(r"\s").astype("int64")
    words = s.str.findall(r"\S+")
    n_stop = words.map(lambda ws: sum(1 for w in ws if w.lower() in STOPWORDS)).astype("int64")
    mean_tok_len = np.where(n_tok > 0, (n_chars - n_space) / n_tok.replace(0, 1), 0.0)
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tok": n_tok,
            "n_alpha": n_alpha,
            "n_digit": n_digit,
            "n_punct": n_punct,
            "n_upper": n_upper,
            "n_stop": n_stop,
            "mean_tok_len": np.round(mean_tok_len, 6),
        },
        index=df.index,
    )


# --- language ID -----------------------------------------------------------

# tiny public stopword/character heuristics per language
_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is you that it for was with are this have from".split()),
    "de": frozenset("der die das und ist nicht ich sie mit ein eine zu den von im".split()),
    "fr": frozenset("le la les et des est une dans que pour qui pas sur avec ne ce".split()),
    "es": frozenset("el la los las y es una en que de por con para no se su al".split()),
}
_CJK = re.compile(r"[一-鿿]")


def detect_lang(text: str) -> str:
    """Heuristic language ID: CJK char ratio, else best stopword-hit language,
    else 'en'. Deterministic; ties broken by language-code order."""
    if not text:
        return "und"
    if len(_CJK.findall(text)) * 4 >= max(1, len(text) // 8):
        return "zh"
    words = [w.lower().strip(".,;:!?\"'()") for w in text.split()]
    if not words:
        return "und"
    best_lang, best_hits = "en", -1
    for lang in sorted(_LANG_MARKERS):
        hits = sum(1 for w in words if w in _LANG_MARKERS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits > 0 else "en"


def detect_lang_batch(texts: pd.Series) -> np.ndarray:
    """Vectorized :func:`detect_lang` (same decision order: empty -> 'und',
    CJK ratio -> 'zh', else best stopword-hit language in sorted-code order
    with strictly-greater replacement, no hits -> 'en'); one pass of pandas
    str kernels + a bincount per language instead of per-doc Python."""
    from itertools import chain

    s = texts.fillna("")
    n = len(s)
    slen = s.str.len().to_numpy()
    n_cjk = s.str.count("[一-鿿]").to_numpy()
    toks = s.str.split()
    lens = toks.map(len).to_numpy(dtype=np.int64)
    doc_idx = np.repeat(np.arange(n), lens)
    words = pd.Series(list(chain.from_iterable(toks)), dtype=object)
    if len(words):
        words = words.str.lower().str.strip(".,;:!?\"'()")
    langs = sorted(_LANG_MARKERS)
    hits = np.zeros((len(langs), n), dtype=np.int64)
    for li, lang in enumerate(langs):
        m = words.isin(_LANG_MARKERS[lang]).to_numpy() if len(words) else np.zeros(0, bool)
        hits[li] = np.bincount(doc_idx, weights=m, minlength=n).astype(np.int64)
    best_li = np.argmax(hits, axis=0)  # first max == sorted-code tie-break
    best_hits = hits[best_li, np.arange(n)]
    lang_arr = np.array(langs, dtype=object)
    out = np.where(best_hits > 0, lang_arr[best_li], "en").astype(object)
    out[lens == 0] = "und"
    out[slen == 0] = "und"
    out[(slen > 0) & (n_cjk * 4 >= np.maximum(1, slen // 8))] = "zh"
    return out


class LangIdStage:
    """Actor-pool stage: regexes/sets built once per actor; batch-vectorized
    scoring (bit-identical to per-doc :func:`detect_lang`)."""

    def __init__(self) -> None:
        self.cjk = _CJK
        self.markers = _LANG_MARKERS

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["lang_pred"] = detect_lang_batch(df["text"])
        return df


# --- fingerprinting --------------------------------------------------------

def fingerprint(text: str, window: int = 8) -> int:
    """Winnowing-style document fingerprint: min-of-rolling-hashes over
    ``window``-grams of whitespace tokens (Schleimer et al., SIGMOD 2003 idea,
    single-fingerprint variant). Deterministic across runs/partitions."""
    toks = ws_tokens(text)
    if not toks:
        return 0
    if len(toks) < window:
        return fnv1a64_bytes(" ".join(toks).encode())
    hashes = [
        fnv1a64_bytes(" ".join(toks[i : i + window]).encode())
        for i in range(len(toks) - window + 1)
    ]
    return min(hashes)


def fingerprint_batch(df: pd.DataFrame, text_col: str = "text") -> pd.Series:
    """Batch-vectorized (chained FNV over rolling token windows + segment-min)
    — bit-identical to per-doc :func:`fingerprint`."""
    from tsrollup.functions import tokens as tk

    tb = tk.TokenBatch(df[text_col])
    return pd.Series(tk.fingerprint_batch(tb, 8), index=df.index, dtype="uint64")
