"""Sign→dense-id vocabulary map — the genericity layer.

The reference keeps letters fully generic (``void*`` signs + a user comparator,
aho_corasick.h:33-45, cmp_default c:134-138) and pays an ordered-map lookup per
symbol at scan time. The TPU-native design resolves genericity *once*, at
registration time: every distinct sign (equivalence class under the user key
function) gets a dense ``int32`` id, and the scan operates on ids only.

* ``key_fn`` plays the role of the reference's ``cmp``/``cmp_arg`` pair: two
  signs are the same letter iff their keys are equal (e.g. case-insensitive
  matching via ``key_fn=str.lower`` — the reference's ``alphacmp``,
  examples/aho_corasick_generic_test.c:48-54).
* Keys must be orderable; enumeration/print order is key order, mirroring the
  reference's comparator-ordered map traversal (c:518, c:580).
* Id 0 is reserved for OOV. A sign never seen in any keyword maps to 0, which
  the dense tables route to the root — exactly the behaviour of an undefined
  transition from state 0 (reference modification [3], README.md:347).
* The *first* sign observed for a key is kept as the representative, matching
  the reference's edge-letter adoption rule (duplicate letters are destroyed,
  c:305-307; the edge keeps the first-inserted letter object).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

OOV = 0


def identity_key(sign: Any) -> Any:
    """Default key: the sign itself (hashable signs, e.g. chars/ints/bytes)."""
    return sign


class Vocab:
    def __init__(self, key_fn: Optional[Callable[[Any], Any]] = None):
        self.key_fn = key_fn or identity_key
        self._ids: Dict[Any, int] = {}
        self._signs: List[Any] = [None]  # index 0 = OOV placeholder
        self._keys: List[Any] = [None]

    def __len__(self) -> int:
        return len(self._signs)  # includes the OOV slot

    @property
    def size(self) -> int:
        return len(self._signs)

    def register(self, sign: Any) -> int:
        """Intern a sign (keyword insertion path). Allocates a fresh id for an
        unseen key; keeps the first-seen sign as representative."""
        k = self.key_fn(sign)
        i = self._ids.get(k)
        if i is None:
            i = len(self._signs)
            self._ids[k] = i
            self._signs.append(sign)
            self._keys.append(k)
        return i

    def lookup(self, sign: Any) -> int:
        """Map a scan-time sign to its id; unknown signs are OOV."""
        return self._ids.get(self.key_fn(sign), OOV)

    def lookup_many(self, signs) -> List[int]:
        ids = self._ids
        key = self.key_fn
        return [ids.get(key(s), OOV) for s in signs]

    def sign(self, letter_id: int) -> Any:
        """Representative sign for a letter id (keyword reconstruction)."""
        return self._signs[letter_id]

    def signs(self, letter_ids) -> List[Any]:
        return [self._signs[i] for i in letter_ids]

    def sort_key(self, letter_id: int) -> Any:
        """Key used for comparator-order traversal parity."""
        return self._keys[letter_id]
