"""BiLSTM-CRF mention tagger — the A2 model slot made real.

Reproduces the reference model's inference math (bilstm_crf_ner.py:329-506)
in numpy with deterministic seeded weights (no torch in this environment;
the weights stand in for a trained checkpoint, the MATH is the real thing):

    char embedding → bidirectional LSTM → linear emission scores →
    CRF Viterbi decode

The Viterbi recurrence keeps the reference's transition-matrix orientation
(``next_tag_var[b, prev, cur] = viterbi[b, prev] + transitions[prev, cur]``,
bilstm_crf_ner.py:432-434) and its masked score-freezing.  Batched padded
inference follows the collate_fn semantics (bilstm_crf_ner.py:180-211):
pad to batch max length + attention mask.

Two deterministic deltas from the reference, both deliberate:

  * the backward LSTM runs from each sequence's true end (equivalent to
    pack_padded_sequence) — the reference feeds the padded batch straight
    to ``nn.LSTM`` (bilstm_crf_ner.py:488), so its backward states depend
    on how much padding the DataLoader happened to add;
  * the Viterbi backtrace starts at each sequence's last VALID position —
    the reference backtracks from the padded tail through backpointers
    computed on frozen scores (bilstm_crf_ner.py:454-459), so its decoded
    tags depend on batch composition.

With those fixed, padded-batch decode ≡ per-sequence decode for any batch
composition — the property the pytest gate asserts against an independent
straight-line (scalar-loop) oracle implementation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.bioes import decode_bioes
from ..functions.hashing import stable_u64

LABELS = ["O", "B-CONCEPT", "I-CONCEPT", "E-CONCEPT", "S-CONCEPT"]
VOCAB_SIZE = 512
EMBED_DIM = 16
HIDDEN_DIM = 32  # total over both directions (16 per direction)


def char_id(ch: str, vocab_size: int = VOCAB_SIZE) -> int:
    """Deterministic char → id (hash vocab; 0 is the pad id)."""
    return int(stable_u64(ch) % (vocab_size - 1)) + 1


class CRFParams:
    """Deterministic seeded model weights (one seed → identical weights in
    every actor/process — no broadcast needed)."""

    def __init__(self, seed: int = 42, labels: list[str] = LABELS,
                 vocab_size: int = VOCAB_SIZE, embed_dim: int = EMBED_DIM,
                 hidden_dim: int = HIDDEN_DIM):
        rng = np.random.default_rng(seed)
        n_labels = len(labels)
        hd = hidden_dim // 2
        s = 0.3
        self.labels = labels
        self.vocab_size = vocab_size
        self.hd = hd
        self.embed = rng.standard_normal((vocab_size, embed_dim)) * s
        # per direction: input/hidden weights + bias, torch gate order i,f,g,o
        self.w_ih = [rng.standard_normal((4 * hd, embed_dim)) * s for _ in range(2)]
        self.w_hh = [rng.standard_normal((4 * hd, hd)) * s for _ in range(2)]
        self.bias = [rng.standard_normal(4 * hd) * s for _ in range(2)]
        # emissions carry the per-char signal; scaled above the transition
        # noise so decoded paths actually switch labels (a flat-emission
        # model degenerates to the best self-loop — all O)
        self.w_tag = rng.standard_normal((n_labels, hidden_dim)) * 2.0
        self.b_tag = rng.standard_normal(n_labels) * s
        # a trained BIOES CRF learns hard penalties on invalid transitions
        # (O→I, B→B, …) — encode exactly that structure: random scores on
        # valid transitions, a large negative on invalid ones, so decoded
        # paths are valid BIOES sequences (entities actually decodable).
        # Indexed [prev, cur] — the orientation the reference's decode uses.
        O, B, I, E, S_ = range(5)
        valid = np.zeros((n_labels, n_labels), dtype=bool)
        for prev, curs in {
            O: (O, B, S_), B: (I, E), I: (I, E), E: (O, B, S_), S_: (O, B, S_),
        }.items():
            for cur in curs:
                valid[prev, cur] = True
        self.transitions = rng.standard_normal((n_labels, n_labels)) * s - 10.0 * (~valid)
        start_ok = np.array([True, True, False, False, True])  # O, B, S
        end_ok = np.array([True, False, False, True, True])  # O, E, S
        self.start_trans = rng.standard_normal(n_labels) * s - 10.0 * (~start_ok)
        self.end_trans = rng.standard_normal(n_labels) * s - 10.0 * (~end_ok)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def _lstm_direction(x: np.ndarray, mask: np.ndarray, w_ih, w_hh, b) -> np.ndarray:
    """One LSTM direction over (B, T, E) with (B, T) mask: padded steps hold
    state.  Python loops over TIME only; every step is a (B, ·) matmul."""
    bsz, seq_len, _ = x.shape
    hd = w_hh.shape[1]
    h = np.zeros((bsz, hd))
    c = np.zeros((bsz, hd))
    out = np.zeros((bsz, seq_len, hd))
    # input-side gate contributions for ALL timesteps in one matmul — only
    # the recurrent h @ w_hh term stays inside the time loop
    xg = x @ w_ih.T + b
    for t in range(seq_len):
        gates = xg[:, t] + h @ w_hh.T
        # torch gate order i,f,g,o: i and f are adjacent → one sigmoid call
        s_if = _sigmoid(gates[:, : 2 * hd])
        i = s_if[:, :hd]
        f = s_if[:, hd:]
        g = np.tanh(gates[:, 2 * hd : 3 * hd])
        o = _sigmoid(gates[:, 3 * hd :])
        c_new = f * c + i * g
        h_new = o * np.tanh(c_new)
        m = mask[:, t][:, None]
        h = m * h_new + (1.0 - m) * h
        c = m * c_new + (1.0 - m) * c
        out[:, t] = h
    return out


def _reverse_padded(x: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Reverse each row's valid prefix in place of position (pad tail kept) —
    the pack_padded equivalence for the backward direction."""
    bsz, seq_len = x.shape[0], x.shape[1]
    t_idx = np.arange(seq_len)[None, :]
    src = lengths[:, None] - 1 - t_idx
    src = np.where(src >= 0, src, t_idx)
    return x[np.arange(bsz)[:, None], src]


def emissions_batch(ids: np.ndarray, mask: np.ndarray, params: CRFParams) -> np.ndarray:
    """(B, T) padded char ids + mask → (B, T, n_labels) emission scores."""
    lengths = mask.sum(axis=1).astype(np.int64)
    x = params.embed[ids]  # (B, T, E)
    fwd = _lstm_direction(x, mask, params.w_ih[0], params.w_hh[0], params.bias[0])
    x_rev = _reverse_padded(x, lengths)
    bwd_rev = _lstm_direction(x_rev, mask, params.w_ih[1], params.w_hh[1], params.bias[1])
    bwd = _reverse_padded(bwd_rev, lengths)
    hcat = np.concatenate([fwd, bwd], axis=2)  # (B, T, H)
    return hcat @ params.w_tag.T + params.b_tag


def viterbi_batch(emissions: np.ndarray, mask: np.ndarray, params: CRFParams) -> np.ndarray:
    """Masked batched Viterbi (reference recurrence; backtrace from each
    sequence's last valid position).  Returns (B, T) label indices — only
    the first ``length`` entries of each row are meaningful."""
    bsz, seq_len, n_labels = emissions.shape
    lengths = mask.sum(axis=1).astype(np.int64)
    vit = params.start_trans[None, :] + emissions[:, 0]
    backptr = np.zeros((bsz, seq_len, n_labels), dtype=np.int64)
    for t in range(1, seq_len):
        # [b, prev, cur] — transitions indexed [prev, cur], faithful to
        # _viterbi_decode's transitions.view(1, L, L)
        ntv = vit[:, :, None] + params.transitions[None, :, :]
        best_prev = ntv.argmax(axis=1)  # (B, L)
        backptr[:, t] = best_prev
        scores = np.take_along_axis(ntv, best_prev[:, None, :], axis=1)[:, 0, :]
        scores = scores + emissions[:, t]
        m = mask[:, t][:, None]
        vit = m * scores + (1.0 - m) * vit
    vit = vit + params.end_trans[None, :]
    best_last = vit.argmax(axis=1)  # (B,)

    paths = np.zeros((bsz, seq_len), dtype=np.int64)
    rows = np.arange(bsz)
    cur = best_last.copy()
    for t in range(seq_len - 1, -1, -1):
        at_end = (lengths - 1) == t
        cur = np.where(at_end, best_last, cur)
        paths[:, t] = cur
        if t > 0:
            stepped = backptr[rows, t, cur]
            within = t <= (lengths - 1)
            cur = np.where(within, stepped, cur)
    return paths


class CRFNER:
    """Actor-pool CRF mention detector — same stage signature as
    GazetteerNER: setup once in ``__init__`` (weights + char-id cache),
    padded batched inference in ``__call__``.

    Paragraphs are length-sorted and chunked so each padded matrix wastes
    little on padding; outputs are batch-composition-invariant (see module
    docstring), so the Ray batch boundaries cannot change results."""

    GROUP = 256  # paragraphs per padded inference matrix (length-sorted, so
    # larger groups amortize the per-timestep Python overhead without much
    # padding waste; 256 measured fastest — 512 starts paying padding)

    def __init__(self, params: CRFParams | None = None):
        self.params = params or CRFParams()
        self._char_cache: dict[str, int] = {}

    def _ids(self, text: str) -> np.ndarray:
        cache = self._char_cache
        out = np.empty(len(text), dtype=np.int64)
        for i, ch in enumerate(text):
            v = cache.get(ch)
            if v is None:
                v = cache[ch] = char_id(ch, self.params.vocab_size)
            out[i] = v
        return out

    def tag_texts(self, texts: list[str]) -> list[list[str]]:
        """texts → per-char BIOES label strings for each text."""
        labels_out: list[list[str]] = [[] for _ in texts]
        nonempty = [(i, t) for i, t in enumerate(texts) if t]
        nonempty.sort(key=lambda it: len(it[1]))
        lab = self.params.labels
        for g0 in range(0, len(nonempty), self.GROUP):
            group = nonempty[g0 : g0 + self.GROUP]
            max_len = len(group[-1][1])
            bsz = len(group)
            ids = np.zeros((bsz, max_len), dtype=np.int64)
            mask = np.zeros((bsz, max_len))
            for r, (_, t) in enumerate(group):
                ids[r, : len(t)] = self._ids(t)
                mask[r, : len(t)] = 1.0
            em = emissions_batch(ids, mask, self.params)
            paths = viterbi_batch(em, mask, self.params)
            for r, (i, t) in enumerate(group):
                labels_out[i] = [lab[j] for j in paths[r, : len(t)]]
        return labels_out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = {"url": [], "para_idx": [], "entity": [], "etype": [], "start": [], "end": []}
        paras: list[str] = []
        meta: list[tuple[str, int]] = []
        for url, text in zip(batch["url"], batch["text_out"]):
            for pi, para in enumerate(text.split("\n")):
                paras.append(para)
                meta.append((url, pi))
        tags = self.tag_texts(paras)
        for (url, pi), para, labels in zip(meta, paras, tags):
            pos = 0
            for entity, etype in decode_bioes(para, labels):
                start = para.find(entity, pos)
                if start < 0:  # discontinuous decode artifact; skip
                    continue
                out["url"].append(url)
                out["para_idx"].append(pi)
                out["entity"].append(entity)
                out["etype"].append(etype)
                out["start"].append(start)
                out["end"].append(start + len(entity))
                pos = start + len(entity)
        df = pd.DataFrame(out)
        for c in ("para_idx", "start", "end"):
            df[c] = df[c].astype("int64")
        return df


def crf_mentions_ds(extracted, concurrency=(1, 4)):
    """extracted(url, text_out) → CRF-decoded mentions (actor pool).

    batch_size 256 pages (~7k paragraphs) so each ``__call__`` length-sorts
    a large pool and the padded GROUP matrices stay homogeneous — output is
    batch-composition-invariant, so only speed changes (round-2 verdict #7:
    r2 config 1.65 s → 0.9 s per 13k bench paragraphs, ~1.9×)."""
    return extracted.map_batches(
        CRFNER, batch_format="pandas", batch_size=256, concurrency=concurrency
    )


# ---------------------------------------------------------------------------
# Training — the reference's epoch loop made real in numpy
# ---------------------------------------------------------------------------


def _hidden_single(text: str, params: CRFParams,
                   char_cache: dict | None = None) -> np.ndarray:
    """text → (T, HIDDEN_DIM) BiLSTM features (the fixed feature extractor
    the perceptron head trains on)."""
    ids = np.array([char_id(c, params.vocab_size) for c in text], dtype=np.int64)[None, :]
    mask = np.ones((1, len(text)))
    x = params.embed[ids]
    lengths = mask.sum(axis=1).astype(np.int64)
    fwd = _lstm_direction(x, mask, params.w_ih[0], params.w_hh[0], params.bias[0])
    x_rev = _reverse_padded(x, lengths)
    bwd_rev = _lstm_direction(x_rev, mask, params.w_ih[1], params.w_hh[1], params.bias[1])
    bwd = _reverse_padded(bwd_rev, lengths)
    return np.concatenate([fwd, bwd], axis=2)[0]


def tag_accuracy(params: CRFParams, texts: list[str], gold: list[list[str]]) -> float:
    """Micro tag-level F1 against gold BIOES labels (equals accuracy for a
    per-char single-label task — the reference evaluates per epoch and
    keeps the best checkpoint, bilstm_crf_ner.py:509-576)."""
    ner = CRFNER(params)
    pred = ner.tag_texts(texts)
    hit = tot = 0
    for p, g in zip(pred, gold):
        tot += len(g)
        hit += sum(1 for a, b in zip(p, g) if a == b)
    return hit / max(1, tot)


def train_perceptron(params: CRFParams, texts: list[str], gold: list[list[str]],
                     epochs: int = 5, lr: float = 0.5,
                     dev_texts: list[str] | None = None,
                     dev_gold: list[list[str]] | None = None) -> dict:
    """Structured-perceptron training of the CRF head — the reference's
    train-eval-save-best epoch loop (bilstm_crf_ner.py:509-576, 799-803)
    re-expressed on this engine's forward math (no torch in this
    environment, so the BiLSTM is a fixed feature extractor and the
    trainable surface is the linear emission head + the transition
    matrices; the Viterbi decode used for updates is the SAME batched
    inference path the pipeline serves).

    Per sentence: decode with current weights; where the predicted path
    differs from gold, bump every gold feature and penalize every predicted
    one (emission rows via ``np.add.at`` on the label index, transition
    bigrams likewise).  Keeps the best-by-dev-F1 parameter snapshot exactly
    like the reference's save-best checkpointing.  Mutates ``params`` to
    the final epoch's weights and returns {'history': [f1/epoch],
    'best_f1': float, 'best': CRFParams-like snapshot dict}."""
    import copy

    lab_idx = {l: i for i, l in enumerate(params.labels)}
    gold_idx = [np.array([lab_idx[l] for l in g], dtype=np.int64) for g in gold]
    if dev_texts is None:
        dev_texts, dev_gold = texts, gold

    def _snapshot():
        return {
            "w_tag": params.w_tag.copy(), "b_tag": params.b_tag.copy(),
            "transitions": params.transitions.copy(),
            "start_trans": params.start_trans.copy(),
            "end_trans": params.end_trans.copy(),
        }

    def _restore(s):
        params.w_tag[:] = s["w_tag"]
        params.b_tag[:] = s["b_tag"]
        params.transitions[:] = s["transitions"]
        params.start_trans[:] = s["start_trans"]
        params.end_trans[:] = s["end_trans"]

    hid = [_hidden_single(t, params) for t in texts]  # BiLSTM frozen → cache
    history: list[float] = []
    best_f1, best = -1.0, _snapshot()
    for _ in range(epochs):
        for h, g in zip(hid, gold_idx):
            em = (h @ params.w_tag.T + params.b_tag)[None, :, :]
            mask = np.ones((1, em.shape[1]))
            pred = viterbi_batch(em, mask, params)[0]
            if np.array_equal(pred, g):
                continue
            # emission head: +gold features, -predicted features
            np.add.at(params.w_tag, g, lr * h)
            np.add.at(params.w_tag, pred, -lr * h)
            np.add.at(params.b_tag, g, lr)
            np.add.at(params.b_tag, pred, -lr)
            # transitions on bigrams + start/end
            if len(g) > 1:
                np.add.at(params.transitions, (g[:-1], g[1:]), lr)
                np.add.at(params.transitions, (pred[:-1], pred[1:]), -lr)
            params.start_trans[g[0]] += lr
            params.start_trans[pred[0]] -= lr
            params.end_trans[g[-1]] += lr
            params.end_trans[pred[-1]] -= lr
        f1 = tag_accuracy(params, dev_texts, dev_gold)
        history.append(f1)
        if f1 > best_f1:
            best_f1, best = f1, _snapshot()
    _restore(best)  # serve the best checkpoint, like the reference
    return {"history": history, "best_f1": best_f1, "best": best}
