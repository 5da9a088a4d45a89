"""Prompt assembly — the pluggable LLM-structurer slot (ops M18/A1).

The reference's document branch sends chunks to an LLM with a template
prompt (read_instruct.py:163-176; grammar spec convert.pmpt); this engine
replaces the LLM with the deterministic rule extractor but keeps the stage
slot: ``assemble_prompt`` reproduces the reference's prompt shapes, and
``StructurerSlot`` is the actor-pool stage a real model client would fill
(construct once per actor, batched calls), defaulting to the rule-based
markdown parse so the pipeline stays deterministic and offline.
"""

from __future__ import annotations

import pandas as pd


def assemble_prompt(template: str, data: str, context_mode: bool = False):
    """Template + chunk → prompt (read_instruct.py:163-176): context mode
    returns the (system, user) pair; plain mode concatenates."""
    if context_mode:
        return {"system": template, "user_data": data}
    return f"{template}\n\n请开始判断以下数据:\n\n{data}"


def rolling_history(history: list[dict], keep_turns: int = 5) -> list[dict]:
    """Context-window maintenance (read_instruct.py:263-265): keep the
    system message plus the most recent turns."""
    if len(history) <= keep_turns:
        return list(history)
    return [history[0]] + history[-(keep_turns - 1):]


class StructurerSlot:
    """Actor-pool slot for the chunk→markdown structurer (A1).

    ``model_fn(chunk_text) -> markdown`` is the injection point; the default
    identity passthrough models the engine's design decision that the
    deterministic grammar already IS markdown (SURVEY.md §2.4 A1).  A real
    LLM client would be constructed here once per actor.
    """

    def __init__(self, template: str = "", model_fn=None):
        self.template = template
        self.model_fn = model_fn or (lambda chunk: chunk)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["structured_md"] = [self.model_fn(c) for c in batch["chunk"]]
        return out
