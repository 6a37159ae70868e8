"""Streaming token -> waveform decoding (TTS serving path).

The reference decodes whole token sequences at once (decode_from_codes,
distil_codec.py:581-594).  For streaming TTS, tokens arrive incrementally; the
decoder stack is non-causal (symmetric conv padding), so each emitted sample
depends on up to ``halo`` future frames.  This decoder keeps a sliding window
of ``context + chunk + lookahead`` frames, decodes it as ONE fixed-shape
jitted program (no recompiles while streaming), and emits only the center
chunk — mathematically identical to full-sequence decoding, chunk by chunk,
with ``lookahead * hop / sr`` seconds of algorithmic latency
(32 frames -> ~341 ms at the reference config).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .parallel.halo import _decoder_halo_for


class StreamingDecoder:
    """Incremental single-stream decoder over a DistilCodec facade.

    >>> dec = StreamingDecoder(codec, chunk_frames=32)
    >>> for tok_batch in token_source:
    ...     audio_chunk = dec.push(tok_batch)   # np.ndarray, may be empty
    >>> tail = dec.flush()
    """

    def __init__(
        self,
        codec,
        chunk_frames: int = 32,
        halo_frames: int | None = None,
        enable_bfloat16: bool = False,
    ):
        self.codec = codec
        self.hop = codec.hop_size * codec.ds_factor
        self.chunk = chunk_frames
        self.halo = (
            halo_frames
            if halo_frames is not None
            else max(_decoder_halo_for(codec.codec_config), 8)
        )
        self.window = self.chunk + 2 * self.halo
        module = codec.module_bf16 if enable_bfloat16 else codec.module
        self._decode = jax.jit(
            lambda v, c: module.apply(v, c, method="decode_codes")
        )
        self._tokens: list[int] = []
        self._emitted = 0  # frames emitted so far

    def _decode_window(self, start: int, length: int) -> np.ndarray:
        window = np.asarray(
            self._tokens[start : start + length], np.int32
        ).reshape(1, 1, -1, 1)
        wave = self._decode(self.codec.variables, jnp.asarray(window))
        return np.asarray(wave)[0]

    def push(self, tokens, minus_token_offset: bool = False) -> np.ndarray:
        """Feed new tokens; returns whatever audio became decidable."""
        if minus_token_offset:
            tokens = [t - self.codec.tokens_id_offset for t in tokens]
        self._tokens.extend(int(t) for t in tokens)
        out = []
        # emit while a full fixed-shape window (chunk + lookahead) is covered
        while len(self._tokens) >= self._emitted + self.chunk + self.halo and (
            len(self._tokens)
            >= max(0, self._emitted - self.halo) + self.window
        ):
            start = max(0, self._emitted - self.halo)
            start = min(start, len(self._tokens) - self.window)
            wave = self._decode_window(start, self.window)
            off = (self._emitted - start) * self.hop
            out.append(wave[off : off + self.chunk * self.hop])
            self._emitted += self.chunk
        if out:
            return np.concatenate(out)
        return np.zeros((0,), np.float32)

    def flush(self) -> np.ndarray:
        """Emit everything pending using the true stream end boundary."""
        total = len(self._tokens)
        if self._emitted >= total:
            return np.zeros((0,), np.float32)
        start = max(0, total - self.window)
        length = total - start
        wave = self._decode_window(start, length)
        off = (self._emitted - start) * self.hop
        self._emitted = total
        return wave[off:]

    @property
    def latency_seconds(self) -> float:
        """Algorithmic lookahead latency."""
        return self.halo * self.hop / self.codec.spec_config.sampling_rate
