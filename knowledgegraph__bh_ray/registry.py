"""Pipeline-step registry — the engine's user-extension surface (SURVEY.md
§2.10).

The reference exposes injectable handlers (image/formula callbacks,
pdf_extractor.py:23-29), engine selection flags, prompt templates and
generic selectors; its orchestration is a hard-coded subprocess list
(automate_scripts.py:35-42).  The engine equivalent: every stage is a named
``PipelineStep`` — a callable ``Dataset → Dataset`` (or an actor class for
stateful stages) with declared input/output columns — registered by name
and composed from a config list.

    register(PipelineStep("extract", kg.parsed_from_pages, ...))
    pipeline = compose(["extract", "flatten_triples", "dedup_edges"])
    out_ds = pipeline(in_ds)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable


@dataclass(frozen=True)
class PipelineStep:
    name: str
    fn: Callable  # Dataset -> Dataset
    input_cols: tuple = ()
    output_cols: tuple = ()
    doc: str = ""


_REGISTRY: dict[str, PipelineStep] = {}


def register(step: PipelineStep) -> PipelineStep:
    if step.name in _REGISTRY:
        raise ValueError(f"duplicate step name: {step.name}")
    _REGISTRY[step.name] = step
    return step


def get(name: str) -> PipelineStep:
    if name not in _REGISTRY:
        raise KeyError(f"unknown step {name!r}; registered: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def names() -> list[str]:
    return sorted(_REGISTRY)


def compose(step_names: list[str]) -> Callable:
    """Config list → single Dataset→Dataset callable (validates the column
    contract between adjacent steps when both sides declare it)."""
    steps = [get(n) for n in step_names]
    for prev, nxt in zip(steps, steps[1:]):
        if prev.output_cols and nxt.input_cols:
            missing = set(nxt.input_cols) - set(prev.output_cols)
            if missing:
                raise ValueError(
                    f"step {nxt.name!r} needs columns {sorted(missing)} that "
                    f"{prev.name!r} does not produce"
                )

    def _run(ds):
        for step in steps:
            ds = step.fn(ds)
        return ds

    return _run


def _register_builtins() -> None:
    """Default steps: the KG DAG's stages by name."""
    import pyarrow as pa

    from .stages.extract import extract_parse_batch, flatten_list_column

    register(
        PipelineStep(
            "extract_parse",
            lambda ds: ds.map_batches(extract_parse_batch, batch_format="pyarrow", batch_size=256),
            input_cols=("url", "html"),
            output_cols=("url", "title", "summary", "text_out", "n_paras", "links", "nodes", "triples"),
            doc="html → parsed page record (M1–M13)",
        )
    )
    register(
        PipelineStep(
            "flatten_nodes",
            lambda ds: ds.map_batches(
                lambda t: flatten_list_column(t, "nodes", keep=["url"]), batch_format="pyarrow"
            ),
            input_cols=("url", "nodes"),
            output_cols=("url", "seq", "id", "name", "type", "parent", "props_json"),
        )
    )
    register(
        PipelineStep(
            "flatten_triples",
            lambda ds: ds.map_batches(
                lambda t: flatten_list_column(t, "triples", keep=["url"]), batch_format="pyarrow"
            ),
            input_cols=("url", "triples"),
            output_cols=("url", "seq", "subj", "pred", "obj", "subj_name", "obj_name", "props_json"),
        )
    )


_register_builtins()
