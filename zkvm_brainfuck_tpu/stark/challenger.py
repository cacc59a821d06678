"""Duplex-sponge Fiat-Shamir challenger (KoalaBear, Poseidon2 width 16, rate 8).

Semantics mirror the reference's `DuplexChallenger<Val, Perm, 16, 8>`
(crates/stark/src/kb31_poseidon2.rs:31, p3_challenger):

- `observe` clears the output buffer, pushes into the input buffer, and
  duplexes when the input buffer reaches RATE.
- duplexing overwrites the state prefix with buffered inputs, permutes, and
  refills the output buffer with state[..RATE].
- `sample` duplexes first if inputs are pending or outputs exhausted, then
  pops from the END of the output buffer (so the first sample is state[7]).
- `sample_ext` draws 4 base samples as EF4 coefficients 0..3.
- `sample_bits` masks the canonical value to the low bits.
- `grind(bits)` finds a witness w with `observe(w); sample_bits(bits) == 0`
  (proof-of-work, 16 bits in the reference FRI config).

The transcript is strictly sequential, so it runs on the host with exact
Python ints; only `grind` fans out to the device, where candidate witnesses
are tested with one batched Poseidon2 permutation per chunk.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from ..ops import field as f
from ..ops import poseidon2 as p2

WIDTH = p2.WIDTH
RATE = p2.RATE


class DuplexChallenger:
    def __init__(self):
        self.state: List[int] = [0] * WIDTH
        self.input_buffer: List[int] = []
        self.output_buffer: List[int] = []
        # Optional transcript log: when a list, every observe/sample appends
        # ["observe"|"sample", value].  The golden-transcript fixture
        # (tests/golden/) freezes this stream for a fixed proof - the
        # artifact a Rust-side cross-check consumes, and a tripwire for any
        # accidental transcript reorder (SURVEY.md section 7 contract).
        self.record = None

    def start_recording(self):
        self.record = []

    def clone(self) -> "DuplexChallenger":
        c = DuplexChallenger()
        c.state = list(self.state)
        c.input_buffer = list(self.input_buffer)
        c.output_buffer = list(self.output_buffer)
        # the record is deliberately NOT cloned (it is a debug artifact)
        return c

    def _duplexing(self):
        assert len(self.input_buffer) <= RATE
        for i, v in enumerate(self.input_buffer):
            self.state[i] = v
        self.input_buffer.clear()
        self.state = p2.permute_host(self.state)
        self.output_buffer = list(self.state[:RATE])

    def observe(self, value: int):
        value = int(value) % f.P
        if self.record is not None:
            self.record.append(["observe", value])
        self.output_buffer.clear()
        self.input_buffer.append(value)
        if len(self.input_buffer) == RATE:
            self._duplexing()

    def observe_slice(self, values: Sequence[int]):
        for v in values:
            self.observe(v)

    def observe_commitment(self, digest: Sequence[int]):
        assert len(digest) == p2.DIGEST_SIZE
        self.observe_slice(digest)

    def sample(self) -> int:
        if self.input_buffer or not self.output_buffer:
            self._duplexing()
        v = self.output_buffer.pop()
        if self.record is not None:
            self.record.append(["sample", v])
        return v

    def sample_ext(self) -> tuple:
        """EF4 element, coefficients (c0, c1, c2, c3), canonical ints."""
        return tuple(self.sample() for _ in range(4))

    def sample_bits(self, bits: int) -> int:
        return self.sample() & ((1 << bits) - 1)

    def check_witness(self, bits: int, witness: int) -> bool:
        self.observe(witness)
        return self.sample_bits(bits) == 0

    # -- proof-of-work ----------------------------------------------------

    def grind(self, bits: int, chunk: int = 1 << 17) -> int:
        """Find and absorb a PoW witness; returns it.

        Device-parallel search with device-GENERATED candidates: the host
        uploads one 16-element state template per call and fetches back two
        scalars (found flag + witness) per chunk - nothing batch-sized ever
        crosses the host<->device link (it is the scarce resource on a
        tunneled TPU; the old path moved ~8 MB per chunk).
        """
        template = np.array(self.state, dtype=np.uint32)
        k = len(self.input_buffer)
        assert k < RATE
        template[:k] = self.input_buffer
        template_dev = f.to_monty(jnp.asarray(template))
        start = 0
        while True:
            found, witness = _grind_program(bits, chunk)(
                template_dev, np.uint32(start), np.uint32(k)
            )
            if bool(found):
                witness = int(witness)
                ok = self.check_witness(bits, witness)  # absorbs into transcript
                assert ok
                return witness
            start += chunk


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=None)
def _grind_program(bits: int, chunk: int):
    """One PoW chunk program: candidates start+i in (dynamic) column k of
    the duplex state.  template_m: (16,) Montgomery state with pending
    inputs already applied; returns (found?, witness) scalars."""
    from ..utils.aot import jit_aot

    def impl(template_m, start, k):
        cand = jnp.arange(chunk, dtype=jnp.uint32) + start
        states = jnp.broadcast_to(template_m, (chunk, WIDTH))
        cand_m = f.to_monty(cand)
        onehot = jnp.arange(WIDTH, dtype=jnp.uint32) == k
        states = jnp.where(onehot[None, :], cand_m[:, None], states)
        out = p2.permute(states)
        sample7 = f.from_monty(out[:, RATE - 1])
        mask = ((sample7 & ((1 << bits) - 1)) == 0) & (cand < f.P)
        idx = jnp.argmax(mask)
        return mask[idx], cand[idx]

    return jit_aot(("grind", bits, chunk), impl)

def warm_grind(bits: int, chunk: int = 1 << 17) -> None:
    """Compile (without executing) the PoW search program."""
    from ..utils.aot import sds

    _grind_program(bits, chunk).warm(sds((16,)), np.uint32(0), np.uint32(0))
