"""Streaming serving: frame-by-frame generation with incremental audio.

The fully-compiled :func:`csm_tpu.generation.generate_compiled` is the
throughput path (whole utterance = one device program).  Serving wants the
opposite trade: emit each 80 ms frame (and its audio) as soon as it exists.
:class:`CSMStreamer` runs the same jitted frame step in a host loop —
prefill once, then one device call per frame — and optionally feeds a
:class:`csm_tpu.codec.streaming.StreamingMimiDecoder` so callers receive
PCM chunks with ~1-frame latency.

Capability match: BASELINE config 4 — batched concurrent streams with
per-stream stop-on-all-zeros (each stream freezes independently; its
outputs zero-pad once stopped) and on-device streaming Mimi decode.

Token parity: the streamer splits its PRNG key exactly like
``generate_compiled``, so for a given seed the emitted frames equal the
single-program path's.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from csm_tpu.config import CSMConfig
from csm_tpu.generation import _bucket, _next_frame_inputs, generate_frame
from csm_tpu.models.llama import KVCache


class CSMStreamer:
    """Stateful frame-by-frame generator over a batch of streams."""

    def __init__(
        self,
        params: dict,
        config: CSMConfig,
        codec=None,
        temperature: float = 1.0,
        topk: int = 50,
        greedy: bool = False,
        stop_on_all_zeros: bool = True,
    ):
        self.params = params
        self.config = config
        self.codec = codec
        self.temperature = temperature
        self.topk = topk
        self.greedy = greedy
        self.stop_on_all_zeros = stop_on_all_zeros

        self._prefill = jax.jit(
            lambda p, ids, mask, tl, cache, key: generate_frame(
                p, config, ids, mask, cache=cache, rng=key,
                temperature=temperature, topk=topk, greedy=greedy,
                true_len=tl, flash_prefill=True,
            )
        )
        self._step = jax.jit(
            lambda p, ids, mask, cache, key: generate_frame(
                p, config, ids, mask, cache=cache, rng=key,
                temperature=temperature, topk=topk, greedy=greedy,
            )
        )

        self.cache: Optional[KVCache] = None
        self._rng = None
        self._decoder = None
        self._done = None
        self._last_frame = None

    # ------------------------------------------------------------------

    def start(self, input_ids, attention_mask, rng: Optional[jax.Array] = None,
              max_new_frames: int = 1024) -> np.ndarray:
        """Prefill the prompt and emit the first frame.  Returns ``[B, 32]``."""
        from csm_tpu.codec.streaming import StreamingMimiDecoder

        ids = np.asarray(input_ids)
        mask = np.asarray(attention_mask, np.float32)
        B, S, W = ids.shape
        Sb = _bucket(S)
        if Sb > S:
            ids = np.concatenate([ids, np.zeros((B, Sb - S, W), ids.dtype)], axis=1)
            mask = np.concatenate([mask, np.zeros((B, Sb - S, W), mask.dtype)], axis=1)

        cache_len = min(self.config.max_seq_len, Sb + max_new_frames)
        cache_len = ((cache_len + 63) // 64) * 64
        dtype = self.params["backbone"]["final_norm"].dtype
        cache = KVCache.create(self.config.backbone, B, cache_len, dtype=dtype)

        rng = rng if rng is not None else jax.random.key(0)
        rng, k0 = jax.random.split(rng)
        out = self._prefill(
            self.params, jnp.asarray(ids), jnp.asarray(mask), jnp.int32(S),
            cache, k0,
        )
        self.cache = out.cache
        self._rng = rng
        self._done = np.zeros((B,), bool)
        self._last_frame = out.samples
        if self.codec is not None:
            self._decoder = StreamingMimiDecoder(self.codec, batch=B)
        return self._observe(out.samples)

    def step(self) -> Optional[np.ndarray]:
        """Generate the next frame for all live streams; ``None`` when every
        stream has stopped."""
        if self._done.all():
            return None
        ids, mask = _next_frame_inputs(self.config, self._last_frame)
        self._rng, k = jax.random.split(self._rng)
        out = self._step(self.params, ids, mask, self.cache, k)
        self.cache = out.cache
        self._last_frame = out.samples
        return self._observe(out.samples)

    def _observe(self, samples) -> np.ndarray:
        frame = np.asarray(samples)  # [B, 32]
        if self.stop_on_all_zeros:
            zero = (frame == 0).all(axis=1)
            frame = np.where(self._done[:, None], 0, frame)
            self._done |= zero
        return frame

    def decode_audio(self, frame: np.ndarray) -> Optional[np.ndarray]:
        """``[B, 32]`` frame codes → ``[B, samples_per_frame]`` PCM chunk."""
        if self._decoder is None:
            return None
        q = self.codec.num_codebooks
        return self._decoder.feed(frame[:, :q, None])

    def run(self, input_ids, attention_mask, max_new_frames: int = 100,
            rng: Optional[jax.Array] = None) -> Iterator[dict]:
        """Generator over frames: yields ``{"frame": [B,32], "audio":
        [B, hop] | None, "done": [B] bool}`` until all streams stop or the
        frame budget is spent."""
        frame = self.start(input_ids, attention_mask, rng=rng,
                           max_new_frames=max_new_frames)
        emitted = 0
        while frame is not None and emitted < max_new_frames:
            if self.stop_on_all_zeros and self._done.all() and (frame == 0).all():
                break
            yield {
                "frame": frame,
                "audio": self.decode_audio(frame),
                "done": self._done.copy(),
            }
            emitted += 1
            if emitted >= max_new_frames:
                break
            frame = self.step()
