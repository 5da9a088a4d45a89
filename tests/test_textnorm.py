from knowledgegraph__bh_ray.functions.textnorm import (
    convert_latex,
    is_math_formula,
    normalize_paragraph,
    replace_dir_markers,
    scrub_images,
)


def test_images_scrubbed():
    assert scrub_images("见 ![图](a.png) 所示") == "见 [图片] 所示"
    assert scrub_images('x <img src="a.png"> y') == "x [图片] y"


def test_latex_inline_converted():
    assert convert_latex("能量 $E=mc^2$ 公式") == "能量 \\(E=mc^2\\) 公式"


def test_math_density_triggers_formula():
    assert is_math_formula("∑∏∫≈≠≤≥±×÷")
    assert not is_math_formula("这是普通的文本段落内容")


def test_structural_patterns_trigger_formula():
    assert is_math_formula("x_{i} plus")  # subscript
    assert is_math_formula("use \\alpha here")  # latex command


def test_superscript_branch_is_dead_like_reference():
    """pdf_extractor.py:175 writes r'\\w^{.+}' with an UNESCAPED ^ — a
    mid-pattern anchor, so the superscript branch never matches.  Parity
    means superscripts do NOT trigger the formula detector."""
    assert not is_math_formula("y^{2} plus")
    assert not is_math_formula("E = mc^{2}")
    # unless something else fires (subscript here)
    assert is_math_formula("y^{2} and x_{i}")


def test_quirk_fixture_suite():
    """Hand-derived expected outputs for rule interactions (reference
    behavior read from pdf_extractor.py / md_formatter.py, not from engine
    output)."""
    # $..$ conversion happens BEFORE the formula check, and \( counts as a
    # LaTeX command (\\[a-zA-Z]+ does not match '\(' — '(' is not a letter),
    # so a converted inline formula alone does NOT flag the paragraph
    assert normalize_paragraph("和 $x+y$ 比") == "和 \\(x+y\\) 比"
    # but a real command inside survives conversion and DOES flag it
    assert normalize_paragraph("见 $\\frac{a}{b}$ 式") == "[公式]"
    # image placeholder text never triggers the math branch
    assert normalize_paragraph("![公式图](f.png)") == "[图片]"
    # density counts symbols over TOTAL length including han text
    assert not is_math_formula("≈" + "字" * 20)  # 1/21 < 0.1
    assert is_math_formula("≈≈≈" + "字" * 7)  # 3/10 > 0.1
    # marker replacement is per line, first marker wins, both glyphs
    assert replace_dir_markers("A\nB") == "- ● A\n    - ◆ B"


def test_dir_markers():
    assert replace_dir_markers(" 要点") == "- ●  要点"
    assert replace_dir_markers(" 细项") == "    - ◆  细项"


def test_full_pipeline_order():
    # image scrub first, then latex, then density, then markers
    assert normalize_paragraph("![x](y.png)") == "[图片]"
    assert normalize_paragraph("∑∏∫∮√∞∠∥≈≠") == "[公式]"
    assert normalize_paragraph("温和段落 $a^2$ 结束") == "温和段落 \\(a^2\\) 结束"


def test_fast_path_identity_property():
    """The trigger-scan fast path must be invisible: for any paragraph,
    normalize_paragraph equals the unconditioned four-pass pipeline."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from knowledgegraph__bh_ray.functions.textnorm import (convert_latex,
                                                           normalize_paragraph,
                                                           replace_dir_markers,
                                                           replace_math,
                                                           scrub_images)

    def full(text):
        return replace_dir_markers(replace_math(convert_latex(scrub_images(text))))

    alphabet = "a字 $\\_{}≈≠![](x)<img>" + ""

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet, max_size=40))
    def check(text):
        assert normalize_paragraph(text) == full(text)

    check()


def test_multiple_dollar_pairs_convert_independently():
    # validated against pdf_extractor._convert_latex directly
    assert convert_latex("$a$ 和 $b$") == "\\(a\\) 和 \\(b\\)"


def test_odd_dollars_pair_greedily_left_to_right():
    """'$5 and $' pairs FIRST (non-greedy leftmost match), so literal
    dollar amounts produce garbled conversions — reference behavior
    (validated against pdf_extractor._convert_latex: 'price $5 and $3$x$'
    → 'price \\(5 and \\)3\\(x\\)'), reproduced verbatim."""
    assert convert_latex("price $5 and $3$x$") == "price \\(5 and \\)3\\(x\\)"


def test_empty_text_is_not_a_formula_deliberate_delta():
    """The reference raises ZeroDivisionError on '' (unguarded density
    division, pdf_extractor.py:171-175 — verified).  The engine's guard
    returning False is a documented deliberate delta."""
    assert is_math_formula("") is False


def test_visible_bullet_glyphs_are_not_dir_markers():
    # DIR_MARKER keys are the PUA glyphs /, NOT the visible
    # ● / ◆ they render to — a line already containing ● stays untouched
    assert replace_dir_markers("● A ◆ B") == "● A ◆ B"
