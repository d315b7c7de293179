"""DefaultRandomCoin — the Fiat–Shamir transcript PRNG.

Byte-exact mirror of crypto/src/random/default.rs:82-247:

- state = (seed digest, u64 counter);
- ``new(seed_elements)``: seed = hash_elements(seed_elements), counter = 0;
- ``reseed(d)``: seed = merge(seed, d), counter = 0;
- ``draw<E>()``: counter += 1; candidate = merge_with_int(seed, counter);
  take the first ELEMENT_BYTES and rejection-sample until every base
  component is canonical (≤ 1000 attempts);
- ``draw_integers(n, 2^k, nonce)``: reseed with merge_with_int(seed, nonce),
  then mask the low bits of the first 8 digest bytes; duplicates allowed;
- ``check_leading_zeros(nonce)``: trailing_zeros of the LE-u64 head of
  merge_with_int(seed, nonce) — the grinding proof-of-work measure.
"""

from __future__ import annotations

from ..math.fields import Field


class RandomCoinError(Exception):
    pass


class DefaultRandomCoin:
    def __init__(self, hasher, seed_elements, field: Field):
        """`seed_elements`: list of base-field element tuples of `field`."""
        self.hasher = hasher
        self.seed = hasher.hash_elements(seed_elements, field)
        self.counter = 0

    def _next(self) -> bytes:
        self.counter += 1
        return self.hasher.merge_with_int(self.seed, self.counter)

    def reseed(self, data: bytes) -> None:
        self.seed = self.hasher.merge(self.seed, data)
        self.counter = 0

    def check_leading_zeros(self, value: int) -> int:
        """Trailing zeros of the first 8 digest bytes read as a LE u64
        (default.rs:141-146) — despite the name."""
        new_seed = self.hasher.merge_with_int(self.seed, value)
        head = int.from_bytes(new_seed[:8], "little")
        if head == 0:
            return 64
        return ((head & -head).bit_length()) - 1

    def draw(self, field: Field):
        """Draw one element of `field` by rejection sampling."""
        for _ in range(1000):
            value = self._next()
            elem = field.try_from_random_bytes(value[: field.element_bytes])
            if elem is not None:
                return elem
        raise RandomCoinError("failed to draw a field element after 1000 tries")

    def draw_pair(self, field: Field):
        return self.draw(field), self.draw(field)

    def draw_integers(self, num_values: int, domain_size: int, nonce: int):
        """Integers in [0, domain_size); duplicates allowed (default.rs:210-247)."""
        if domain_size & (domain_size - 1) != 0:
            raise RandomCoinError("domain size must be a power of two")
        if num_values >= domain_size:
            raise RandomCoinError("number of values must be smaller than domain size")
        self.seed = self.hasher.merge_with_int(self.seed, nonce)
        self.counter = 0
        v_mask = domain_size - 1
        values = []
        for _ in range(1000):
            head = int.from_bytes(self._next()[:8], "little")
            values.append(head & v_mask)
            if len(values) == num_values:
                break
        if len(values) < num_values:
            raise RandomCoinError(
                f"needed {num_values} integers but drew only {len(values)}"
            )
        return values
