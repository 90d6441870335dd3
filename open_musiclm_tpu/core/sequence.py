"""Token-sequence specifications and static sequence layouts.

TPU-native counterpart of the reference's ``TokenSequenceInfo`` dataclass
(reference: open_musiclm/open_musiclm.py:23-31) plus a *static layout* object
that precomputes, at trace time, every offset needed to assemble the
multi-sequence token stream ``[start_0, tokens_0, start_1, tokens_1, ...]``
(reference: open_musiclm/open_musiclm.py:120-150).

The reference recomputes splits/offsets dynamically with python lists of
tensors every forward; under XLA we want one fixed-shape concatenated stream
with all boundaries known at compile time so the whole stage forward is a
single fused program.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class TokenSequenceSpec:
    """Static description of one token sequence in a token-conditioned stage.

    Attributes:
      codebook_size: number of real codes per quantizer (EOS id == codebook_size).
      num_quantizers: quantizers interleaved per timestep (1 for semantic,
        3 for coarse, 5 for fine, 12 for CLAP conditioning).
      unique_consecutive: whether consecutive-duplicate removal applies
        (reference flag; off in all shipped MusicLM configs).
    """

    codebook_size: int
    num_quantizers: int = 1
    unique_consecutive: bool = False

    @property
    def eos_id(self) -> int:
        return self.codebook_size

    @property
    def vocab_with_eos(self) -> int:
        return self.codebook_size + 1

    @property
    def embed_vocab(self) -> int:
        """Size of the flattened (per-quantizer-offset) embedding table.

        Mirrors the reference exactly: the table is
        ``(codebook_size + 1) * num_quantizers`` rows but quantizer offsets are
        ``q * codebook_size`` (open_musiclm.py:76-78,126-130), so the EOS row of
        quantizer q aliases code 0 of quantizer q+1. We reproduce this for
        checkpoint parity.
        """
        return self.vocab_with_eos * self.num_quantizers


@dataclasses.dataclass(frozen=True)
class SequenceLayout:
    """Static layout of a concatenated multi-sequence token stream.

    Given per-sequence flattened token counts ``lengths`` (AFTER any EOS
    append), the stream is ``[start_0, tok_0, start_1, tok_1, ...]`` with total
    length ``sum(lengths) + num_sequences``.

    For each sequence i:
      * ``start_pos[i]``: position of its start token in the stream.
      * ``tok_slice(i)``: (begin, length) of its tokens in the stream.
      * ``pred_slice(i)``: (begin, length) of transformer outputs that predict
        its tokens — outputs at positions ``[start_i, tok_i[:-1]]``, i.e. a
        length-``lengths[i]`` window beginning at ``start_pos[i]``
        (reference split logic: open_musiclm.py:141-156).
    """

    specs: Tuple[TokenSequenceSpec, ...]
    lengths: Tuple[int, ...]

    def __post_init__(self):
        assert len(self.specs) == len(self.lengths)

    @property
    def num_sequences(self) -> int:
        return len(self.specs)

    @property
    def total_len(self) -> int:
        return int(sum(self.lengths)) + self.num_sequences

    @property
    def start_positions(self) -> Tuple[int, ...]:
        pos, out = 0, []
        for n in self.lengths:
            out.append(pos)
            pos += n + 1
        return tuple(out)

    def tok_slice(self, i: int) -> Tuple[int, int]:
        begin = self.start_positions[i] + 1
        return begin, self.lengths[i]

    def pred_slice(self, i: int) -> Tuple[int, int]:
        return self.start_positions[i], self.lengths[i]

    def quantizer_index(self, i: int) -> np.ndarray:
        """Per-token quantizer index (position % Q) for sequence i."""
        q = self.specs[i].num_quantizers
        return np.arange(self.lengths[i]) % q

    def with_lengths(self, lengths: Sequence[int]) -> "SequenceLayout":
        return SequenceLayout(self.specs, tuple(int(n) for n in lengths))


def quantizer_offsets(spec: TokenSequenceSpec, length: int) -> np.ndarray:
    """Flat-embedding id offsets for a length-``length`` flattened sequence.

    offset[t] = (t % Q) * codebook_size — matches reference
    open_musiclm.py:126-130 (note: codebook_size, *not* codebook_size+1).
    """
    return (np.arange(length) % spec.num_quantizers) * spec.codebook_size
