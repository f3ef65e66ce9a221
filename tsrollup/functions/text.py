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


def count_tokens_batch(df, text_col: str = "text") -> pd.Series:
    """n_tok per row = count of \\S+ runs (SQL: len(regexp_extract_all(text,'\\S+'))).

    Arrow-native: one split kernel + a bincount of non-empty tokens (Python
    ``re`` \\S and ``str.isspace`` agree over all of Unicode, and so does
    Arrow's whitespace predicate — scanned exhaustively). Accepts a pandas
    DataFrame or a pyarrow Table."""
    import pyarrow.compute as pc

    from tsrollup.functions import tokens as tk

    col = df[text_col] if isinstance(df, pd.DataFrame) else df.column(text_col)
    sp = tk.split_whitespace(col)
    n = len(sp)
    raw_lens = pc.list_value_length(sp).to_numpy(zero_copy_only=False).astype(np.int64)
    nonempty = pc.greater(pc.binary_length(sp.flatten()), 0).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(n), raw_lens)
    counts = np.bincount(doc_idx[nonempty], minlength=n).astype(np.int64)
    index = df.index if isinstance(df, pd.DataFrame) else None
    return pd.Series(counts, index=index)


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
    # stopword hits: Arrow split+lower+is_in+bincount — no per-token Python
    # (scalar spec: sum(1 for w in findall(r'\S+') if w.lower() in STOPWORDS))
    import pyarrow as pa
    import pyarrow.compute as pc

    from tsrollup.functions import tokens as tk

    sp = tk.split_whitespace(s)
    raw_lens = pc.list_value_length(sp).to_numpy(zero_copy_only=False).astype(np.int64)
    toks = sp.flatten()
    low = _lower_like_python(toks)
    m = pc.is_in(low, value_set=pa.array(sorted(STOPWORDS), type=low.type)).to_numpy(
        zero_copy_only=False
    )
    doc_idx = np.repeat(np.arange(len(s)), raw_lens)
    n_stop = pd.Series(
        np.bincount(doc_idx, weights=m, minlength=len(s)).astype(np.int64), index=s.index
    )
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


def _lower_like_python(tokens: "pa.Array") -> "pa.Array":
    """``pc.utf8_lower`` patched to Python ``str.lower`` semantics. Exhaustive
    scan over all of Unicode found exactly one divergence: U+0130 (İ), which
    Python full-case-maps to 'i' + U+0307 while utf8proc simple-maps to 'i'
    — pre-expanding it restores bit parity (guarded by the hypothesis fuzz
    in tests/test_functions.py)."""
    import pyarrow.compute as pc

    return pc.utf8_lower(pc.replace_substring(tokens, "İ", "i̇"))


def detect_lang_batch(texts) -> np.ndarray:
    """Vectorized :func:`detect_lang` (same decision order: empty -> 'und',
    CJK ratio -> 'zh', else best stopword-hit language in sorted-code order
    with strictly-greater replacement, no hits -> 'en').

    Arrow-native end to end: split/lower/trim/is_in run inside Arrow buffers
    (no per-token Python object — the round-2 chain-flatten built one str per
    token) + one bincount per language. Accepts a pd.Series or pa.Array;
    whitespace/lower/CJK-count semantics verified bit-equal to the scalar
    spec over the full Unicode range."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from tsrollup.functions import tokens as tk

    arr = tk.as_string_array(texts)
    n = len(arr)
    slen = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    n_cjk = (
        pc.count_substring_regex(arr, "[一-鿿]").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    sp = pc.utf8_split_whitespace(arr)
    raw_lens = pc.list_value_length(sp).to_numpy(zero_copy_only=False).astype(np.int64)
    toks = sp.flatten()
    doc_idx = np.repeat(np.arange(n), raw_lens)
    nonempty = pc.greater(pc.binary_length(toks), 0).to_numpy(zero_copy_only=False)
    lens = np.bincount(doc_idx[nonempty], minlength=n)  # true str.split() counts
    # lower+strip every token; Arrow's empty edge tokens stay empty and can
    # never hit a marker set, so they need no filtering here
    words = pc.utf8_trim(_lower_like_python(toks), ".,;:!?\"'()")
    langs = sorted(_LANG_MARKERS)
    hits = np.zeros((len(langs), n), dtype=np.int64)
    for li, lang in enumerate(langs):
        m = pc.is_in(
            words, value_set=pa.array(sorted(_LANG_MARKERS[lang]), type=words.type)
        ).to_numpy(zero_copy_only=False)
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
    """Actor-pool stage: marker sets/value arrays built once per actor;
    batch-vectorized Arrow scoring (bit-identical to per-doc
    :func:`detect_lang`). pyarrow in/out — the text column never converts
    to pandas objects."""

    def __init__(self) -> None:
        self.cjk = _CJK
        self.markers = _LANG_MARKERS

    def __call__(self, t):
        import pyarrow as pa

        pred = detect_lang_batch(t.column("text"))
        return t.append_column("lang_pred", pa.array(pred, type=pa.string()))


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


# Unicode-whitespace -> ' ' map shared by the normalization kernel and every
# oracle that needs DuckDB's ASCII-only RE2 '\s' to agree with the engine's
# Unicode tokenizer (the class matches pipelines.docqueries._DOCS_WS_NORM)
WS_CLASS = r"[\p{Z}\x{85}\x{1C}-\x{1F}]"


def normalize_batch(texts) -> "pa.Array":
    """Canonical corpus text normalization, one vectorized chain:
    Unicode-whitespace map -> lower -> collapse ASCII ws runs -> trim.
    Arrow's RE2 + utf8proc are the SAME libraries DuckDB uses, so
    ``trim(regexp_replace(lower(regexp_replace(text, WS_CLASS, ' ', 'g')),
    '\\s+', ' ', 'g'), ' ')`` reproduces this byte-for-byte (fuzz-tested in
    tests/test_functions.py)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from tsrollup.functions.tokens import as_string_array

    x = as_string_array(texts)
    x = pc.replace_substring_regex(x, pattern=WS_CLASS, replacement=" ")
    x = pc.utf8_lower(x)
    x = pc.replace_substring_regex(x, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim(x, characters=" ")
