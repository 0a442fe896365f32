"""Unit tests for the pure function layer (no Ray needed)."""

import numpy as np

from pyjedai_ray.functions import similarity as sim
from pyjedai_ray.functions.hashing import (
    band_hashes,
    hamming64,
    hash64,
    hash64_array,
    minhash_signature,
    perm_seeds,
    simhash64,
    simhash_band_keys,
)
from pyjedai_ray.functions.text import (
    count_tokens,
    detect_lang,
    extract_text,
    fingerprint_md5,
    normalize_text,
    quality_stats,
)
from pyjedai_ray.functions.tokenize import (
    extended_qgram_keys,
    extended_suffix_keys,
    qgram_keys,
    standard_tokens,
    suffix_keys,
    word_shingles,
)


def test_standard_tokens():
    # mirrors reference block_building.py:503-512 semantics
    assert standard_tokens("Hello, World! hello_again") == ["again", "hello", "world"]
    assert standard_tokens("") == []
    assert standard_tokens("  __  ") == []


def test_qgram_keys():
    # token shorter than q kept whole; else all char q-grams
    assert qgram_keys("abc", q=6) == ["abc"]
    assert qgram_keys("abcdefg", q=6) == ["abcdef", "bcdefg"]


def test_suffix_keys():
    assert suffix_keys("abc", suffix_length=6) == ["abc"]
    got = suffix_keys("abcdefgh", suffix_length=6)
    assert got == sorted({"abcdefgh", "bcdefgh", "cdefgh"})


def test_extended_suffix_keys():
    got = extended_suffix_keys("abcdefg", suffix_length=6)
    # token + substrings of length 6
    assert got == sorted({"abcdefg", "abcdef", "bcdefg"})


def test_extended_qgram_keys_short_token():
    assert extended_qgram_keys("abc", q=6) == ["abc"]


def test_word_shingles():
    assert word_shingles("a b c d e f", k=5) == ["a b c d e", "b c d e f"]
    assert word_shingles("a b", k=5) == ["a b"]
    assert word_shingles("", k=5) == []


def test_hash64_deterministic():
    a = hash64("hello", seed=42)
    assert a == hash64("hello", seed=42)
    assert a != hash64("hello", seed=43)
    arr = hash64_array(["x", "y", "x"], seed=1)
    assert arr[0] == arr[2] and arr[0] != arr[1]
    assert arr.dtype == np.uint64


def test_minhash_similar_docs_share_minhashes():
    seeds = perm_seeds(128, 42)
    h1 = hash64_array([f"sh{i}" for i in range(100)])
    h2 = hash64_array([f"sh{i}" for i in range(5, 105)])  # jaccard ~ 0.905
    s1 = minhash_signature(h1, seeds)
    s2 = minhash_signature(h2, seeds)
    agree = (s1 == s2).mean()
    assert 0.75 < agree < 1.0


def test_band_hashes_identical_docs_collide_everywhere():
    seeds = perm_seeds(128, 42)
    h = hash64_array([f"sh{i}" for i in range(50)])
    sig = minhash_signature(h, seeds)
    b = band_hashes(np.stack([sig, sig]), 16, 8, 42)
    assert (b[0] == b[1]).all()


def test_simhash_hamming():
    h1 = simhash64(hash64_array([f"t{i}" for i in range(100)]))
    h2 = simhash64(hash64_array([f"t{i}" for i in range(2, 102)]))
    h3 = simhash64(hash64_array([f"u{i}" for i in range(100)]))
    d_close = hamming64(np.array([h1], dtype=np.uint64), np.array([h2], dtype=np.uint64))[0]
    d_far = hamming64(np.array([h1], dtype=np.uint64), np.array([h3], dtype=np.uint64))[0]
    assert d_close < d_far


def test_simhash_band_keys():
    keys = simhash_band_keys(0x1234_5678_9ABC_DEF0, bands=4)
    assert len(keys) == 4
    assert len(set(keys)) == 4  # namespaced per chunk


def test_set_metrics():
    a, b = {"x", "y", "z"}, {"y", "z", "w"}
    assert abs(sim.jaccard(a, b) - 2 / 4) < 1e-12
    assert abs(sim.dice(a, b) - 4 / 6) < 1e-12
    assert abs(sim.cosine(a, b) - 2 / 3) < 1e-12
    assert abs(sim.overlap_coefficient(a, b) - 2 / 3) < 1e-12
    assert sim.jaccard(set(), set()) == 1.0
    assert sim.jaccard(a, set()) == 0.0


def test_generalized_jaccard():
    assert abs(sim.generalized_jaccard(["a", "a", "b"], ["a", "b", "b"]) - 2 / 4) < 1e-12


def test_levenshtein():
    assert sim.levenshtein_sim("kitten", "sitting") == 1 - 3 / 7
    assert sim.levenshtein_sim("abc", "abc") == 1.0
    assert sim.levenshtein_sim("", "abc") == 0.0


def test_jaro():
    assert abs(sim.jaro("martha", "marhta") - 0.944444444) < 1e-6
    assert sim.jaro("abc", "abc") == 1.0
    assert sim.jaro("abc", "xyz") == 0.0


def test_extract_text_roundtrip():
    text = "hello world this is a page"
    html = b"<html><head><title>t</title></head><body><p>" + text.encode() + b"</p></body></html>"
    assert extract_text(html) == text


def test_extract_text_entities():
    html = b"<body><p>a &amp; b</p></body>"
    assert extract_text(html) == "a & b"


def test_normalize_text():
    assert normalize_text("Hello, World!") == "hello world"
    assert normalize_text("The cat", strip_stopwords=True) == "cat"
    assert normalize_text("a1b2", strip_digits=True) == "ab"


def test_detect_lang():
    assert detect_lang("the cat sat on the mat and it was happy") == "en"
    assert detect_lang("der hund und die katze ist nicht da") == "de"
    assert detect_lang("你好世界 这是一个测试 这是一个测试 这是一个测试") == "zh"


def test_quality_stats():
    st = quality_stats("the quick brown fox " * 10)
    assert st["n_tokens"] == 40
    assert st["quality_score"] == 1.0
    assert quality_stats("")["n_tokens"] == 0


def test_fingerprint_stability():
    assert fingerprint_md5("Hello,  World") == fingerprint_md5("hello world")
    assert fingerprint_md5("a b") != fingerprint_md5("a c")


def test_count_tokens():
    assert count_tokens("a b  c") == 3


def test_multiset_tokenizers():
    from pyjedai_ray.functions.tokenize import (
        qgram_multiset_keys,
        standard_multiset_tokens,
    )

    # repeated tokens get occurrence-numbered keys (bag semantics)
    assert standard_multiset_tokens("the cat the cat the") == sorted(
        ["the#0", "the#1", "the#2", "cat#0", "cat#1"]
    )
    assert standard_multiset_tokens("") == []
    # shared multiset size of "aa aa" vs "aa": min(2,1)=1 shared key
    a = set(standard_multiset_tokens("aa aa"))
    b = set(standard_multiset_tokens("aa"))
    assert len(a & b) == 1
    g = qgram_multiset_keys("abab", q=2)
    assert g == sorted(["ab#0", "ba#0", "ab#1"])


# ---- batched hashing kernels vs per-doc reference (property-based) ----

from hypothesis import given, settings
from hypothesis import strategies as st

_texts = st.lists(
    st.text(alphabet="ab cd1 ", min_size=0, max_size=60), min_size=1, max_size=12
)


@settings(max_examples=40, deadline=None)
@given(_texts, st.integers(min_value=1, max_value=7))
def test_shingle_hashes_batched_matches_per_doc(texts, k):
    import numpy as np

    from pyjedai_ray.functions.hashing import (
        hash64,
        shingle_hash_array,
        shingle_hashes_batched,
    )
    from pyjedai_ray.functions.tokenize import token_sequence

    tok_lists = [token_sequence(t) for t in texts]
    cache: dict = {}
    th_all = np.array(
        [cache.setdefault(t, hash64(t, 7)) for toks in tok_lists for t in toks],
        dtype=np.uint64,
    )
    offs = np.concatenate([[0], np.cumsum([len(t) for t in tok_lists])]).astype(np.int64)
    got_v, got_offs = shingle_hashes_batched(th_all, offs, k)
    for i, toks in enumerate(tok_lists):
        want = shingle_hash_array(toks, k, 7, cache)
        got = got_v[got_offs[i] : got_offs[i + 1]]
        assert np.array_equal(got, want), (i, toks)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=20),
        min_size=1,
        max_size=8,
    )
)
def test_simhash_and_minhash_batched_match_per_doc(hash_lists):
    import numpy as np

    from pyjedai_ray.functions.hashing import (
        minhash_signature,
        minhash_signatures_concat,
        perm_seeds,
        simhash64,
        simhash64_batched,
    )

    arrs = [np.array(sorted(set(h)), dtype=np.uint64) for h in hash_lists]
    concat = np.concatenate(arrs) if arrs else np.array([], dtype=np.uint64)
    offs = np.concatenate([[0], np.cumsum([a.size for a in arrs])]).astype(np.int64)
    sims = simhash64_batched(concat, offs)
    seeds = perm_seeds(16, 42)
    sigs = minhash_signatures_concat(concat, offs, seeds)
    for i, a in enumerate(arrs):
        assert int(sims[i]) == simhash64(a)
        assert np.array_equal(sigs[i], minhash_signature(a, seeds))


def test_canonical_url():
    from pyjedai_ray.functions.text import canonical_url

    # host lowered, scheme/www/fragment/tracking stripped — path case KEPT
    assert canonical_url("HTTPS://WWW.Example.COM/CaseSensitive#x") == "example.com/CaseSensitive"
    assert canonical_url("http://example.com:80/a/") == "example.com/a"
    assert canonical_url("https://example.com:8080/a") == "example.com:8080/a"
    # mid-query tracking removal keeps real params in order
    assert canonical_url("https://e.com/p?a=1&utm_source=x&b=2") == "e.com/p?a=1&b=2"
    assert canonical_url("https://e.com/p?utm_source=x&utm_campaign=y") == "e.com/p"
    assert canonical_url("www.foo.com/x/") == "foo.com/x"
    assert canonical_url("") == ""


def test_url_dedup_clusters(ray_session):
    import ray.data

    from pyjedai_ray.stages.dedup import url_dedup

    urls = [
        (0, "https://www.shop.com/item/1"),
        (1, "HTTP://Shop.COM/item/1/"),
        (2, "https://shop.com/item/1?utm_source=mail"),
        (3, "https://shop.com/item/2"),
    ]
    ds = ray.data.from_items([{"doc_id": i, "url": u} for i, u in urls])
    got = sorted(
        (r["doc_id"], r["curl"], r["cluster_id"])
        for r in url_dedup(ds, num_partitions=4).take_all()
    )
    assert got == [
        (0, "shop.com/item/1", 0),
        (1, "shop.com/item/1", 0),
        (2, "shop.com/item/1", 0),
        (3, "shop.com/item/2", 3),
    ]
