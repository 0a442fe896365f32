"""Text analysis + web-page primitives.

* ``extract_text``      — deterministic HTML -> text (input_hint invariant:
  byte-identical ``text`` per ``url`` across runs and parallelism levels).
* ``normalize_text``    — reference ``Data.clean_dataset`` analog
  (src/pyjedai/datamodel.py:310-353): lowercase, strip digits / punctuation /
  stopwords (fixed built-in English stopword list — no NLTK download).
* ``detect_lang``       — n-gram/stopword heuristic language ID (en/de/es/fr/zh).
* ``quality_stats``     — length / punctuation / stopword-ratio scoring.
* ``fingerprint_md5``   — document fingerprint over the normalized token
  stream (md5 so a DuckDB oracle can reproduce it exactly).
"""

from __future__ import annotations

import hashlib
import html as _html
import re

from .tokenize import token_sequence

_BODY_RE = re.compile(rb"<body[^>]*>(.*)</body>", re.DOTALL | re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")

# Fixed English stopword list (subset of the classic SMART list; frozen here
# so results never depend on an external corpus download).
EN_STOPWORDS = frozenset(
    """a about above after again all am an and any are as at be because been
    before being below between both but by could did do does doing down during
    each few for from further had has have having he her here hers him his how
    i if in into is it its just me more most my no nor not of off on once only
    or other our out over own same she so some such than that the their them
    then there these they this those through to too under until up very was we
    were what when where which while who whom why will with you your""".split()
)

_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "was", "for"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "den", "von"},
    "es": {"el", "la", "que", "de", "los", "se", "las", "por", "un", "una"},
    "fr": {"le", "la", "les", "des", "est", "une", "dans", "qui", "pas", "pour"},
}


def extract_text(html_bytes: bytes) -> str:
    """Deterministic, pure HTML->text: body contents, tags stripped, entities
    unescaped, whitespace collapsed. No external parser; byte-stable."""
    m = _BODY_RE.search(html_bytes)
    payload = m.group(1) if m else html_bytes
    s = payload.decode("utf-8", errors="replace")
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    return " ".join(s.split())


_URL_SPLIT_RE = re.compile(r"^(?:([A-Za-z][A-Za-z0-9+.-]*)://)?([^/?#]*)(.*)$", re.DOTALL)
_URL_PORT_RE = re.compile(r":(?:80|443)$")
_URL_FRAGMENT_RE = re.compile(r"#.*$", re.DOTALL)
_URL_TRACKING_RE = re.compile(r"(?:utm_[a-z]+|fbclid|gclid)=[^&#]*&?")
_URL_DANGLING_RE = re.compile(r"[?&]+$")


def canonical_url(url: str) -> str:
    """Canonical form for URL-level dedup (re-crawl / mirror collapse):
    scheme dropped, host lowercased, leading ``www.`` and default ports
    stripped, fragment dropped, tracking params (``utm_*``/``fbclid``/
    ``gclid``) removed, dangling ``?``/``&`` and trailing slashes trimmed.
    Path/query case is PRESERVED (paths are case-sensitive). The step order
    is the contract — the url_dedup oracle replicates it in SQL."""
    m = _URL_SPLIT_RE.match(url.strip())
    host = m.group(2).lower()
    rest = m.group(3)
    if host.startswith("www."):
        host = host[4:]
    host = _URL_PORT_RE.sub("", host)
    rest = _URL_FRAGMENT_RE.sub("", rest)
    rest = _URL_TRACKING_RE.sub("", rest)
    rest = _URL_DANGLING_RE.sub("", rest)
    return host + rest.rstrip("/")


def normalize_text(
    text: str,
    lowercase: bool = True,
    strip_digits: bool = False,
    strip_punct: bool = True,
    strip_stopwords: bool = False,
) -> str:
    s = text.lower() if lowercase else text
    if strip_digits:
        s = re.sub(r"[0-9]", "", s)
    if strip_punct:
        s = re.sub(r"[^\w\s]|_", " ", s)
    toks = s.split()
    if strip_stopwords:
        toks = [t for t in toks if t not in EN_STOPWORDS]
    return " ".join(toks)


def detect_lang(text: str) -> str:
    """Heuristic language ID: CJK codepoint ratio, then stopword votes."""
    if not text:
        return "und"
    cjk = sum(1 for c in text[:4000] if "一" <= c <= "鿿")
    if cjk > max(4, 0.05 * min(len(text), 4000)):
        return "zh"
    toks = set(token_sequence(text[:4000]))
    best, best_score = "und", 0
    for lang in sorted(_LANG_MARKERS):  # sorted -> deterministic tie-break
        score = len(toks & _LANG_MARKERS[lang])
        if score > best_score:
            best, best_score = lang, score
    return best


def quality_stats(text: str) -> dict:
    """Length / punctuation / stopword-ratio features + a [0,1] score."""
    toks = token_sequence(text)
    n_tokens = len(toks)
    n_chars = len(text)
    mean_tok = (sum(len(t) for t in toks) / n_tokens) if n_tokens else 0.0
    non_alnum = sum(1 for c in text if not (c.isalnum() or c.isspace()))
    punct_ratio = non_alnum / n_chars if n_chars else 0.0
    stop_cnt = sum(1 for t in toks if t in EN_STOPWORDS)
    stop_ratio = stop_cnt / n_tokens if n_tokens else 0.0
    score = 1.0
    if n_tokens < 20 or n_tokens > 100_000:
        score *= 0.5
    if not 2.0 <= mean_tok <= 12.0:
        score *= 0.5
    if punct_ratio > 0.3:
        score *= 0.5
    return {
        "n_tokens": n_tokens,
        "mean_token_len": mean_tok,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


def fingerprint_md5(text: str) -> str:
    """md5 over the normalized token stream — SQL-parity:
    md5(array_to_string(<tokens>, ' '))."""
    return hashlib.md5(" ".join(token_sequence(text)).encode("utf-8")).hexdigest()


def fingerprint_md5_batch(col) -> list[str]:
    """Batch fingerprints. ASCII batches tokenize on the Arrow fast path
    (utf8_lower -> split -> empty-filter -> binary_join; same RE2-vs-Python
    \\W guard as the signer/exploder — non-ASCII falls back per row for
    byte-identical tokens); only the md5 itself stays a Python loop."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if not isinstance(col, pa.Array):
        col = col.combine_chunks()
    col = pc.fill_null(pc.cast(col, pa.string()), "")
    if len(col) and pc.all(pc.string_is_ascii(col)).as_py():
        toks = pc.split_pattern_regex(pc.utf8_lower(col), "[\\W_]+")
        flat = pc.list_flatten(toks)
        mask = pc.not_equal(flat, "")
        par = pc.list_parent_indices(toks).filter(mask)
        flat = flat.filter(mask)
        lens = np.bincount(
            par.to_numpy(zero_copy_only=False).astype(np.int64), minlength=len(col)
        )
        offsets = np.concatenate([[0], np.cumsum(lens)])
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
        )
        joined = pc.binary_join(lists, " ")
        return [hashlib.md5(s.encode("utf-8")).hexdigest() for s in joined.to_pylist()]
    return [fingerprint_md5(t or "") for t in col.to_pylist()]


def count_tokens(text: str) -> int:
    return len(token_sequence(text))


def count_bpe_ish_tokens(text: str) -> int:
    """BPE-ish token count: word pieces of <=4 chars + punctuation marks
    (cheap deterministic stand-in for a real tokenizer)."""
    n = 0
    for t in re.findall(r"[A-Za-z0-9]+|[^\sA-Za-z0-9]", text):
        n += (len(t) + 3) // 4 if t[0].isalnum() else 1
    return n
