"""Text normalizers (reference ops M5–M8, SURVEY.md §2.3).

Clean-room re-implementation of the normalization rules observed in the
reference (citations are file:line into /root/reference/):

  * image scrub        — md/HTML/LaTeX image patterns → ``[图片]``
                         (md_formatter.py:12-16, 92-110)
  * LaTeX ``$…$``      — → ``\\(…\\)``  (pdf_extractor.py:156-160)
  * formula detector   — math-symbol density > 0.1 OR sub/superscript/LaTeX
                         command regex → whole text replaced by ``[公式]``
                         (pdf_extractor.py:162-188)
  * bullet markers     — private-use glyphs \uf06e/\uf075 → ``- ●`` / ``- ◆``
                         with indent (pdf_extractor.py:18-21, 190-200)

``normalize_paragraph`` applies them in the order image → latex → formula →
markers, per paragraph (the reference applies them per extracted PDF page;
our unit is the extracted web paragraph — documented delta).  All regexes are
module-level compiled constants so batch UDFs pay compile cost once.
"""

from __future__ import annotations

import re

IMAGE_PLACEHOLDER = "[图片]"
FORMULA_PLACEHOLDER = "[公式]"

# md_formatter.py:12-16 — image patterns (md / HTML / LaTeX figure env)
_RE_IMAGES = re.compile(
    r'(!\[.*?\]\(.*?\))|(<img.*?src=".*?".*?>)|(\\begin\{figure\}.*?\\end\{figure\})',
    re.DOTALL,
)

# pdf_extractor.py:159 — inline $…$ → \(…\)
_RE_LATEX_INLINE = re.compile(r"\$(.*?)\$")

# pdf_extractor.py:17 — math-symbol class (kept verbatim: it is the spec)
_RE_MATH_SYMBOLS = re.compile(r"[\∑∏∫∮√∞∠∥≈≠≡≤≥±×÷→⇌⇔∨∧¬∃∀]")

# pdf_extractor.py:174-178 — structural formula patterns.  The reference's
# superscript pattern r'\w^{.+}' leaves the ^ UNESCAPED — a mid-pattern
# anchor, so the branch can never match (dead code).  Reproduced verbatim:
# superscripts do NOT trigger the formula detector (quirk-parity fixture in
# tests/test_textnorm.py).
_RE_SUBSCRIPT = re.compile(r"\w_{.+}")
_RE_SUPERSCRIPT = re.compile(r"\w^{.+}")
_RE_LATEX_CMD = re.compile(r"\\[a-zA-Z]+")

# pdf_extractor.py:18-21 — private-use directory-marker glyphs
DIR_MARKERS = {
    "\uf06e": ("●", 0),
    "\uf075": ("◆", 1),
}


def scrub_images(text: str) -> str:
    """Replace image markup with ``[图片]`` (block form gets newlines,
    md_formatter.py:99-100)."""

    def _rep(m: re.Match) -> str:
        return f"\n{IMAGE_PLACEHOLDER}\n" if m.group().count("\n") > 1 else IMAGE_PLACEHOLDER

    return _RE_IMAGES.sub(_rep, text)


# md_formatter.py:18-23 — the standalone MD post-processor's formula
# patterns, combined in the reference's own order (block $$ before inline $,
# so '$$x$$' is one block match, not two inline hits) under DOTALL
_RE_MD_FORMULAS = re.compile(
    r"(\$\$.*?\$\$)|(\$.*?\$)|(\\begin\{equation\}.*?\\end\{equation\})|(\\\[.*?\\\])",
    re.DOTALL,
)


def scrub_formulas_md(text: str) -> str:
    """The md_formatter formula pass: block/inline TeX markup → ``[公式]``
    (block form gets surrounding newlines) — the markdown post-processing
    sibling of :func:`scrub_images` (md_formatter.py:18-23, 92-110).  Note
    this is a DIFFERENT rule set from the pdf-extract pipeline's
    ``convert_latex`` + density detector; both are reference ops."""

    def _rep(m: re.Match) -> str:
        return (f"\n{FORMULA_PLACEHOLDER}\n" if m.group().count("\n") > 1
                else FORMULA_PLACEHOLDER)

    return _RE_MD_FORMULAS.sub(_rep, text)


def convert_latex(text: str) -> str:
    return _RE_LATEX_INLINE.sub(r"\\(\1\\)", text)


def is_math_formula(text: str) -> bool:
    """Symbol-density / structural-pattern formula predicate
    (pdf_extractor.py:168-188).

    Deliberate delta: the reference divides by ``len(text)`` unguarded and
    raises ZeroDivisionError on an empty paragraph (verified against
    pdf_extractor.py directly); the engine returns False — an empty
    paragraph cannot be a formula, and the pipeline must not crash."""
    if not text:
        return False
    density = len(_RE_MATH_SYMBOLS.findall(text)) / len(text)
    if density > 0.1:
        return True
    return bool(
        _RE_SUBSCRIPT.search(text)
        or _RE_SUPERSCRIPT.search(text)
        or _RE_LATEX_CMD.search(text)
    )


def replace_math(text: str) -> str:
    return FORMULA_PLACEHOLDER if is_math_formula(text) else text


def replace_dir_markers(text: str) -> str:
    """Private-use glyph → markdown list marker, first marker per line wins
    (pdf_extractor.py:190-200)."""
    lines = []
    for line in text.split("\n"):
        for marker, (symbol, indent) in DIR_MARKERS.items():
            if marker in line:
                line = line.replace(marker, "    " * indent + f"- {symbol} ")
                break
        lines.append(line)
    return "\n".join(lines)


# fast-path trigger scan: every rule above needs at least one of these
# characters to do anything — '!'/'<'/'\' (image markup), '$' (inline
# latex), '\' (latex command), '_' (subscript), the math-symbol class
# (density + structure), or a marker glyph.  A paragraph containing none is
# returned UNCHANGED by the full pipeline, so one C-speed class scan skips
# four regex passes on the (dominant) plain-text case.  Identity is
# property-tested against the unconditioned pipeline.
_RE_NORM_TRIGGERS = re.compile(
    "[!<\\\\$_∑∏∫∮√∞∠∥≈≠≡≤≥±×÷→⇌⇔∨∧¬∃∀]"
)


def normalize_paragraph(text: str) -> str:
    """Full normalization pipeline for one extracted paragraph."""
    if not _RE_NORM_TRIGGERS.search(text):
        return text
    out = scrub_images(text)
    out = convert_latex(out)
    out = replace_math(out)
    out = replace_dir_markers(out)
    return out


def normalize_pdf_page(text: str) -> str:
    """The PDF path's default per-page pipeline (pdf_extractor.py:150-154):
    latex → formula → markers, NO markup-image scrub (PDF images are
    detected structurally per page, not as markup)."""
    return replace_dir_markers(replace_math(convert_latex(text)))
