from hypothesis import given, strategies as st

from knowledgegraph__bh_ray.functions.bioes import decode_bioes, encode_bioes


def test_decode_reference_semantics():
    # B/I/E span
    assert decode_bioes("清华大学", ["B-ORG", "I-ORG", "I-ORG", "E-ORG"]) == [("清华大学", "ORG")]
    # S singleton
    assert decode_bioes("京", ["S-LOC"]) == [("京", "LOC")]
    # O flushes an open entity
    assert decode_bioes("北京市x", ["B-LOC", "I-LOC", "I-LOC", "O"]) == [("北京市", "LOC")]
    # entity still open at sequence end is flushed (bilstm_crf_ner.py:624-627)
    assert decode_bioes("北京", ["B-LOC", "I-LOC"]) == [("北京", "LOC")]


def test_decode_type_mismatch_drops_continuation():
    # I- of a different type neither extends nor closes; the open entity
    # survives until the next flush (reference quirk)
    assert decode_bioes("abc", ["B-PER", "I-ORG", "O"]) == [("a", "PER")]


def test_decode_b_flushes_open_entity():
    assert decode_bioes("abcd", ["B-PER", "I-PER", "B-ORG", "E-ORG"]) == [
        ("ab", "PER"),
        ("cd", "ORG"),
    ]


def test_encode_roundtrip_simple():
    text = "清华大学位于北京"
    spans = [(0, 4, "ORG"), (6, 8, "LOC")]
    labels = encode_bioes(text, spans)
    assert labels == ["B-ORG", "I-ORG", "I-ORG", "E-ORG", "O", "O", "B-LOC", "E-LOC"]
    assert decode_bioes(text, labels) == [("清华大学", "ORG"), ("北京", "LOC")]


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(1, 5), st.sampled_from(["PER", "ORG", "LOC"])),
        max_size=5,
    )
)
def test_encode_decode_roundtrip_property(raw_spans):
    """Non-overlapping spans always round-trip through BIOES."""
    text = "abcdefghijklmnopqrstuvwxyz0123456789"
    spans = []
    taken = set()
    for start, length, etype in sorted(raw_spans):
        end = min(start + length, len(text))
        if start >= end or any(i in taken for i in range(start, end)):
            continue
        spans.append((start, end, etype))
        taken.update(range(start, end))
    labels = encode_bioes(text, spans)
    decoded = decode_bioes(text, labels)
    assert decoded == [(text[s:e], t) for s, e, t in spans]
