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
    assert is_math_formula("y^{2} plus")  # superscript
    assert is_math_formula("use \\alpha here")  # latex command


def test_dir_markers():
    assert replace_dir_markers(" 要点") == "- ●  要点"
    assert replace_dir_markers(" 细项") == "    - ◆  细项"


def test_full_pipeline_order():
    # image scrub first, then latex, then density, then markers
    assert normalize_paragraph("![x](y.png)") == "[图片]"
    assert normalize_paragraph("∑∏∫∮√∞∠∥≈≠") == "[公式]"
    assert normalize_paragraph("温和段落 $a^2$ 结束") == "温和段落 \\(a^2\\) 结束"
