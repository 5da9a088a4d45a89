from hypothesis import given, settings, strategies as st

from knowledgegraph__bh_ray.functions.chunker import (
    chunk_with_hierarchy,
    split_md_content,
    update_hierarchy,
)

MD = (
    "# 标题一\n\n"
    "这是第一段内容，包含一些文字。\n\n"
    "## 小节\n\n"
    "- 列表项目一\n- 列表项目二\n\n"
    "正文继续，" + "内容" * 200 + "\n\n"
    "### 更深\n\n尾部段落。\n"
)


def test_chunks_concatenate_to_input():
    for max_len in (64, 128, 512):
        chunks = split_md_content(MD, max_length=max_len, tolerance=16)
        assert "".join(chunks) == MD


def test_chunk_size_budget():
    chunks = split_md_content(MD, max_length=128, tolerance=32)
    # every chunk within budget unless it is a single unbreakable block
    for c in chunks[:-1]:
        assert len(c.encode("utf-8")) <= 160 + 400  # long CJK run is one block


def test_prefers_heading_boundaries():
    text = "aaa\n\nbbb\n## head\nccc" + "\nddd" * 50
    chunks = split_md_content(text, max_length=20, tolerance=5)
    # some chunk must start exactly at the heading boundary
    assert any(c.startswith("\n## head") for c in chunks)


def test_empty_and_small_inputs():
    assert split_md_content("") == []
    assert split_md_content("short") == ["short"]


@given(st.text(alphabet="ab\n#-● 列", max_size=2000), st.integers(32, 256))
@settings(max_examples=50, deadline=None)
def test_concat_property(content, max_len):
    assert "".join(split_md_content(content, max_len, 20)) == content


def test_hierarchy_stack():
    assert update_hierarchy([], 1) == [1]
    assert update_hierarchy([1], 2) == [1, 2]
    assert update_hierarchy([1, 2], 2) == [1, 2]
    assert update_hierarchy([1, 2, 3], 1) == [1]
    assert update_hierarchy([1, 2], None) == []


def test_chunk_with_hierarchy_tracks_headings():
    text = "# a\n" + "x" * 300 + "\n## b\n" + "y" * 300
    out = chunk_with_hierarchy(text, max_length=200, tolerance=20)
    assert out[0]["hierarchy"] == []
    assert any(c["hierarchy"] for c in out[1:])
