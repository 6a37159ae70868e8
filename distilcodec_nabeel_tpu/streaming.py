"""Streaming audio <-> token conversion (live serving paths).

The reference processes whole sequences at once (encode distil_codec.py
:545-573, decode_from_codes :581-594).  For streaming, samples/tokens arrive
incrementally; both model stacks are non-causal (symmetric conv padding), so
each output depends on a bounded window of future input.  Both streamers keep
a sliding window of ``context + chunk + lookahead`` frames, run it as ONE
fixed-shape jitted program (no recompiles while streaming), and emit only the
center chunk — mathematically identical to full-sequence processing, chunk by
chunk, with ``lookahead * hop / sr`` seconds of algorithmic latency
(32 frames -> ~341 ms at the reference config).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .parallel.halo import _decoder_halo_for, _encoder_halo_for


class StreamingDecoder:
    """Incremental decoder over a DistilCodec facade.

    Code frames arrive either as a flat int list (the student's 1-group x
    1-residual token stream) or as an (n, G*R) array (teacher mode) — the
    same per-frame layout ``StreamingEncoder.push`` emits.  Works for any
    ``downsample_factor`` product p: one code frame = ``p * hop`` samples.

    >>> dec = StreamingDecoder(codec, chunk_frames=32)
    >>> for tok_batch in token_source:
    ...     audio_chunk = dec.push(tok_batch)   # np.ndarray, may be empty
    >>> tail = dec.flush()

    ``n_streams=N`` decodes N SYNCHRONIZED streams per dispatch (one fixed
    (G, N, W, R) program; a serving tick that advances every active stream
    together — the single-stream decode uses a fraction of the chip, so
    aggregate throughput multiplies, bench_streaming.py --streams).  Then
    ``push`` takes (N, n) flat tokens or (N, n, G*R) and returns
    (N, samples); per-stream values are identical to N independent
    single-stream decoders (tests/test_streaming_multi.py).  Streams that
    end early can be padded with any valid code id and trimmed by the
    caller (the reference's batch decode makes the same contract,
    distil_codec.py:620-625)."""

    def __init__(
        self,
        codec,
        chunk_frames: int = 32,
        halo_frames: int | None = None,
        enable_bfloat16: bool = False,
        n_streams: int = 1,
    ):
        self.codec = codec
        self.hop = codec.hop_size * codec.ds_factor
        self.gr = codec.ngroups * codec.nresiduals
        self.chunk = chunk_frames
        self.halo = (
            halo_frames
            if halo_frames is not None
            else max(
                -(-_decoder_halo_for(codec.codec_config) // codec.ds_factor),
                8,
            )
        )
        self.window = self.chunk + 2 * self.halo
        module = codec.module_bf16 if enable_bfloat16 else codec.module
        self._decode = jax.jit(
            lambda v, c: module.apply(v, c, method="decode_codes")
        )
        self.n_streams = n_streams
        # (N, T, G*R) — N synchronized streams advance together
        self._frames = np.zeros((n_streams, 0, self.gr), np.int32)
        self._emitted = 0  # frames emitted so far

    def _decode_window(self, start: int, length: int) -> np.ndarray:
        window = self._frames[:, start : start + length]  # (N, L, G*R)
        g, r = self.codec.ngroups, self.codec.nresiduals
        N, L = window.shape[:2]
        ind = window.reshape(N, L, g, r)
        ind = np.transpose(ind, (2, 0, 1, 3))  # (G, N, L, R)
        wave = self._decode(self.codec.variables, jnp.asarray(ind))
        return np.asarray(wave)  # (N, L * hop)

    def push(self, tokens, minus_token_offset: bool = False) -> np.ndarray:
        """Feed new code frames (flat list or (n, G*R) array; with
        ``n_streams=N`` an (N, n) or (N, n, G*R) array); returns whatever
        audio became decodable — (samples,) single-stream, (N, samples)
        multi."""
        arr = np.asarray(tokens, np.int64)
        if self.n_streams > 1 and (
            arr.ndim < 2 or arr.shape[0] != self.n_streams
        ):
            # a flat concatenated buffer would otherwise be silently
            # misassigned across streams by the reshape (advisor r4)
            raise ValueError(
                f"push with n_streams={self.n_streams} needs an "
                f"({self.n_streams}, n) or ({self.n_streams}, n, G*R) "
                f"array, got shape {arr.shape}"
            )
        arr = arr.reshape(self.n_streams, -1, self.gr)
        if minus_token_offset:
            arr = arr - self.codec.tokens_id_offset
        self._frames = np.concatenate(
            [self._frames, arr.astype(np.int32)], axis=1
        )
        out = []
        # emit while a full fixed-shape window (chunk + lookahead) is covered
        n_frames = self._frames.shape[1]
        while n_frames >= self._emitted + self.chunk + self.halo and (
            n_frames >= max(0, self._emitted - self.halo) + self.window
        ):
            start = max(0, self._emitted - self.halo)
            start = min(start, n_frames - self.window)
            wave = self._decode_window(start, self.window)
            off = (self._emitted - start) * self.hop
            out.append(wave[:, off : off + self.chunk * self.hop])
            self._emitted += self.chunk
        if out:
            cat = np.concatenate(out, axis=1)
        else:
            cat = np.zeros((self.n_streams, 0), np.float32)
        return cat if self.n_streams > 1 else cat[0]

    def flush(self) -> np.ndarray:
        """Emit everything pending using the true stream end boundary.

        Compilation: for streams of at least one window (the streaming use
        case) ``start = total - window`` so the flush call has the SAME shape
        as every ``push`` window — it reuses the already-compiled program,
        zero extra compiles (regression-tested in
        tests/test_streaming.py::test_flush_reuses_push_program).  Only
        sub-window streams (< chunk + 2*halo code frames) compile once per
        distinct stream length; jit caches those per process.  The end
        boundary must sit at the true last frame (the generator's conv
        zero-padding is the stream-end condition), so padding the tail to a
        fixed shape would change the final samples — exactness wins here.
        For one-shot short sequences prefer ``codec.decode_from_codes``."""
        total = self._frames.shape[1]
        if self._emitted >= total:
            z = np.zeros((self.n_streams, 0), np.float32)
            return z if self.n_streams > 1 else z[0]
        start = max(0, total - self.window)
        length = total - start
        wave = self._decode_window(start, length)
        off = (self._emitted - start) * self.hop
        self._emitted = total
        wave = wave[:, off:]
        return wave if self.n_streams > 1 else wave[0]

    @property
    def latency_seconds(self) -> float:
        """Algorithmic lookahead latency."""
        return self.halo * self.hop / self.codec.spec_config.sampling_rate


class StreamingEncoder:
    """Incremental single-stream tokenizer (live-audio path).

    Feed raw 24 kHz samples as they arrive; emits code frames exactly equal
    to full-sequence ``encode_codes`` on the final stream (the non-causal
    encoder sees ``halo`` code frames of real right-context before a frame is
    emitted; the stream start/end reflect padding matches the mel front-end,
    mel_spec.py:30-37).

    Supports any ``downsample_factor`` product p (student p=1, teacher p=2):
    ``chunk_frames``/``halo_frames`` are CODE frames; each code frame covers
    ``p`` mel frames = ``p * hop`` samples, and window starts stay p-aligned
    so the strided downsample conv (grfvq.py:68-96) keeps its global phase.

    NOTE the reference facade's 1-sample left-pad quirk (distil_codec.py
    :133-136): to reproduce ``codec.encode`` token ids bit-for-bit, push a
    single zero sample before the stream.

    >>> enc = StreamingEncoder(codec, chunk_frames=32)
    >>> for block in microphone:
    ...     codes = enc.push(block)      # (n, G*R) int32, may be empty
    >>> codes_tail = enc.flush()

    ``n_streams=N`` tokenizes N SYNCHRONIZED live streams per dispatch (one
    fixed (N, window) program; see StreamingDecoder.n_streams): ``push``
    takes (N, samples) and returns (N, n, G*R); per-stream codes are
    identical to N independent single-stream encoders
    (tests/test_streaming_multi.py)."""

    def __init__(
        self,
        codec,
        chunk_frames: int = 32,
        halo_frames: int | None = None,
        enable_bfloat16: bool = False,
        n_streams: int = 1,
    ):
        self.n_streams = n_streams
        self.codec = codec
        spec = codec.spec_config
        self.p = codec.ds_factor  # mel frames per code frame
        self.hop, self.win = spec.hop_size, spec.win_size
        self.left = (self.win - self.hop) // 2
        self.right = (self.win - self.hop + 1) // 2
        self.chunk = chunk_frames  # code frames per emission
        self.halo = (
            halo_frames
            if halo_frames is not None
            else max(
                -(-_encoder_halo_for(codec.codec_config) // self.p), 8
            )
        )
        self.window = self.chunk + 2 * self.halo  # code frames per jitted call
        self._win_mel = self.window * self.p
        self._win_samples = self._win_mel * self.hop + (self.win - self.hop)

        from .dsp.mel import compress, melscale_fbanks
        from .dsp.stft import _dft_basis, _windowed_spec, frame_signal

        n_fft, n_mels = spec.n_fft, spec.num_mels
        n_freqs = n_fft // 2 + 1
        basis = jnp.asarray(_dft_basis(n_fft, self.win))
        fb = jnp.asarray(
            melscale_fbanks(
                n_freqs, spec.fmin, spec.fmax, n_mels, spec.sampling_rate
            )
        )
        module = codec.module_bf16 if enable_bfloat16 else codec.module
        win, hop = self.win, self.hop

        def encode_window(variables, samples):
            # samples: (N, win_samples) — N synchronized streams.  Same
            # windowed-DFT construction as the batch mel path
            # (dsp/stft._windowed_spec) so streaming == full-sequence stays
            # bit-for-bit — a different partial-sum order could flip
            # near-tie VQ argmins.
            if win % hop == 0:
                sp = _windowed_spec(
                    samples.astype(jnp.float32), basis, win, hop
                )
            else:
                frames = frame_signal(samples, win, hop)  # (N, n_mel, win)
                sp = jnp.einsum(
                    "...tw,wf->...tf",
                    frames.astype(jnp.float32),
                    basis,
                    precision=jax.lax.Precision.HIGHEST,
                )
            re, im = sp[..., :n_freqs], sp[..., n_freqs:]
            mag = jnp.sqrt(re * re + im * im + 1e-6)
            mel = compress(
                jnp.einsum(
                    "...tf,fm->...tm",
                    mag,
                    fb,
                    precision=jax.lax.Precision.HIGHEST,
                )
            )
            return module.apply(
                variables, mel, method="_encode_from_mel"
            )  # (N, G*R, n_mel // p)

        self._encode = jax.jit(encode_window)
        self._samples = np.zeros((n_streams, 0), np.float32)
        self._emitted = 0  # code frames emitted so far

    def _ready_frames(self) -> int:
        """Mel frames computable with only real right-context (no end
        reflect)."""
        avail = self.left + self._samples.shape[1]
        return max(0, (avail - self.win) // self.hop + 1)

    def _lead(self) -> np.ndarray:
        s = self._samples
        if s.shape[1] > self.left:
            return s[:, 1 : self.left + 1][:, ::-1]
        return np.zeros((self.n_streams, self.left), np.float32)

    def _emit(self, start: int, first: int, count: int) -> np.ndarray:
        """Encode the fixed window at code frame ``start`` (p-aligned mel
        start); return codes [first, first+count)."""
        padded = np.concatenate([self._lead(), self._samples], axis=1)
        begin = start * self.p * self.hop
        sample_win = padded[:, begin : begin + self._win_samples]
        codes = self._encode(
            self.codec.variables, jnp.asarray(sample_win)
        )  # (N, GR, window)
        arr = np.asarray(codes)
        # (N, count, GR)
        return np.transpose(arr[:, :, first : first + count], (0, 2, 1))

    def push(self, samples) -> np.ndarray:
        """Feed new samples ((n,) single-stream, (N, n) multi); returns code
        frames that became final — (n, G*R) int32 single-stream,
        (N, n, G*R) multi (n may be 0)."""
        arr = np.asarray(samples, np.float32)
        if self.n_streams > 1 and (
            arr.ndim != 2 or arr.shape[0] != self.n_streams
        ):
            # a flat concatenated buffer would otherwise be silently
            # misassigned across streams by the reshape (advisor r4)
            raise ValueError(
                f"push with n_streams={self.n_streams} needs an "
                f"({self.n_streams}, n) samples array, got shape {arr.shape}"
            )
        self._samples = np.concatenate(
            [self._samples, arr.reshape(self.n_streams, -1)], axis=1
        )
        out = []
        while True:
            e = self._emitted
            s = max(0, e - self.halo)
            if self._ready_frames() < (s + self.window) * self.p:
                break
            out.append(self._emit(s, e - s, self.chunk))
            self._emitted += self.chunk
        gr = self.codec.codec_config.quantizer.n_groups * (
            self.codec.codec_config.quantizer.n_codebooks
        )
        if out:
            cat = np.concatenate(out, axis=1)
        else:
            cat = np.zeros((self.n_streams, 0, gr), np.int32)
        return cat if self.n_streams > 1 else cat[0]

    def flush(self) -> np.ndarray:
        """Emit the remaining frames using the true end-of-stream reflect
        padding.  Total emitted over the stream = len(samples) // (hop · p)
        (the reference's n_hop_len bookkeeping, distil_codec.py:119).

        The flush window ends exactly at the stream's last real mel frame —
        the full-sequence encoder zero-pads its conv stacks there, so ending
        the computation at the same boundary (rather than padding the window
        with zero samples, which would produce non-zero log-mel frames past
        the end) keeps flush == full encode even for streams shorter than one
        window.

        Compilation: for streams of at least one window and p=1 (student
        mode) the flush window is ``window`` mel frames — the SAME shape as
        every ``push`` window, so flush reuses the compiled push program with
        zero extra compiles (tests/test_streaming.py::
        test_flush_reuses_push_program).  p>=2 adds at most one extra shape
        (the t_mel % p remainder frame).  Only sub-window streams compile
        once per distinct length; for one-shot short clips prefer
        ``codec.encode``."""
        s = self._samples
        t_mel = s.shape[1] // self.hop
        total = t_mel // self.p
        gr = self.codec.codec_config.quantizer.n_groups * (
            self.codec.codec_config.quantizer.n_codebooks
        )
        if self._emitted >= total:
            self._emitted = total
            z = np.zeros((self.n_streams, 0, gr), np.int32)
            return z if self.n_streams > 1 else z[0]
        tail = (
            s[:, -self.right - 1 : -1][:, ::-1]
            if s.shape[1] > self.right
            else np.zeros((self.n_streams, self.right), np.float32)
        )
        padded = np.concatenate([self._lead(), s, tail], axis=1)
        start = max(0, total - self.window)
        begin = start * self.p * self.hop
        n_mel = t_mel - start * self.p
        need = begin + n_mel * self.hop + (self.win - self.hop)
        if padded.shape[1] < need:
            padded = np.pad(padded, ((0, 0), (0, need - padded.shape[1])))
        codes = self._encode(
            self.codec.variables, jnp.asarray(padded[:, begin:need])
        )
        arr = np.asarray(codes)  # (N, GR, L)
        first = self._emitted - start
        out = np.transpose(arr[:, :, first : total - start], (0, 2, 1))
        self._emitted = total
        return out if self.n_streams > 1 else out[0]

    @property
    def latency_seconds(self) -> float:
        """Algorithmic lookahead latency."""
        return (
            self.halo
            * self.p
            * self.hop
            / self.codec.spec_config.sampling_rate
        )
