"""Checkpoint / resume — a capability the reference cannot express.

The reference automaton lives only in process RAM (SURVEY.md §5: no
serialization exists). Here the machine serializes losslessly:

* the trie is stored as its creation-order edge list (prev_state/prev_letter
  per state) — replaying edges in state-id order reconstructs the *identical*
  automaton, including state ids, Meyer inverse-fail sets and output counts;
* the vocabulary stores (key, representative sign) pairs via numpy's pickle
  support (signs must be picklable — true for str/bytes/int/tuple alphabets);
* keyword end-states, ranks and user values round-trip as arrays/objects.

``save_machine``/``load_machine`` give a fully *mutable* machine back —
insertion can continue after resume (Meyer mode keeps working because the IF
sets are rebuilt by the replay, not stored).

Scan resume is orthogonal and cheap: a scan is a pure function of (tables,
stream); ``models.scanner.StreamSession`` carries (offset, tail halo) across
chunks, so a crashed shard simply rescans its chunk (SURVEY.md §5, failure
detection: scans are stateless and idempotent given the tables).
"""

from __future__ import annotations

import pickle
from typing import Any, BinaryIO, Union

import numpy as np

FORMAT_VERSION = 1


def save_machine(machine, path_or_file: Union[str, BinaryIO]) -> None:
    b = machine._b
    b.ensure_fail_states()
    S = b.n_states
    prev_state = np.asarray(b.prev_state, np.int32)[:S]
    prev_letter = np.asarray(b.prev_letter, np.int32)[:S]
    is_end = np.asarray(b.is_end, bool)[:S]
    kw_rank = np.asarray(b.kw_rank, np.int32)[:S]
    vocab = machine.vocab
    vocab_blob = pickle.dumps({
        "keys": vocab._keys[1:],
        "signs": vocab._signs[1:],
    })
    values_blob = pickle.dumps(machine._values)
    key_fn_blob = pickle.dumps(machine.vocab.key_fn)
    np.savez_compressed(
        path_or_file,
        format_version=np.int64(FORMAT_VERSION),
        incremental=np.bool_(machine.incremental),
        prev_state=prev_state,
        prev_letter=prev_letter,
        is_end=is_end,
        kw_rank=kw_rank,
        version=np.int64(machine.version),
        vocab=np.frombuffer(vocab_blob, np.uint8),
        values=np.frombuffer(values_blob, np.uint8),
        key_fn=np.frombuffer(key_fn_blob, np.uint8),
    )


def load_machine(path_or_file: Union[str, BinaryIO], key_fn: Any = "saved",
                 backend: str = "auto"):
    """Reconstruct a mutable Machine. ``key_fn``: "saved" unpickles the
    stored key function (fails for lambdas/closures — pass the function
    explicitly then)."""
    from ..models.machine import Machine

    z = np.load(path_or_file, allow_pickle=False)
    if int(z["format_version"]) != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version "
                         f"{int(z['format_version'])}")
    if key_fn == "saved":
        key_fn = pickle.loads(z["key_fn"].tobytes())
    vocab_data = pickle.loads(z["vocab"].tobytes())
    values = pickle.loads(z["values"].tobytes())

    m = Machine(key_fn=key_fn, incremental=bool(z["incremental"]),
                backend=backend)
    # Restore the vocabulary exactly (ids and representatives).
    v = m.vocab
    for k, sign in zip(vocab_data["keys"], vocab_data["signs"]):
        i = len(v._signs)
        v._ids[k] = i
        v._keys.append(k)
        v._signs.append(sign)

    prev_state = z["prev_state"]
    prev_letter = z["prev_letter"]
    is_end = z["is_end"]
    kw_rank = z["kw_rank"]
    S = len(prev_state)

    # Replay edges in creation order: child ids are assigned sequentially,
    # so state s recreates as exactly state s (incl. Meyer IF maintenance).
    # The native backend replays the whole trie in one FFI call (round-2
    # weakness: one ctypes round-trip per state was minutes at 2.5M
    # states); the Python backend keeps the per-edge loop.
    b = m._b
    if hasattr(b, "restore_machine"):
        b.restore_machine(prev_state, prev_letter, is_end, kw_rank)
    else:
        ends = np.nonzero(is_end)[0]
        rank_order = ends[np.argsort(kw_rank[ends], kind="stable")]
        for s in range(1, S):
            got = b.insert_letter(int(prev_state[s]), int(prev_letter[s]))
            if got != s:
                raise ValueError(f"checkpoint replay diverged at state {s}")
        # Mark keyword ends in rank order so ranks reassign identically.
        for s in rank_order:
            b.insert_end(int(s))
    # Restore the snapshot-version counter exactly: replay only counts
    # distinct end-insertions, but duplicates also bump the version, and
    # StreamSession checkpoints pin on it.
    b.set_version(int(z["version"]))
    m._values = values
    return m


def save_tables(tables, path_or_file: Union[str, BinaryIO]) -> None:
    """Snapshot-only save (scan-capable, not insert-capable): the dense
    device tables as plain arrays — the minimal artifact a serving fleet
    distributes to chips."""
    np.savez_compressed(
        path_or_file,
        format_version=np.int64(FORMAT_VERSION),
        delta=tables.delta, nb_outputs=tables.nb_outputs, fail=tables.fail,
        depth=tables.depth, is_end=tables.is_end, kw_rank=tables.kw_rank,
        prev_state=tables.prev_state, prev_letter=tables.prev_letter,
        emit_start=tables.emit_start, emit_state=tables.emit_state,
        version=np.int64(tables.version),
        n_keywords=np.int64(tables.n_keywords),
    )


def load_tables(path_or_file: Union[str, BinaryIO]):
    from ..core.builder import DenseTables

    z = np.load(path_or_file, allow_pickle=False)
    return DenseTables(
        delta=z["delta"], nb_outputs=z["nb_outputs"], fail=z["fail"],
        depth=z["depth"], is_end=z["is_end"], kw_rank=z["kw_rank"],
        prev_state=z["prev_state"], prev_letter=z["prev_letter"],
        emit_start=z["emit_start"], emit_state=z["emit_state"],
        version=int(z["version"]), n_keywords=int(z["n_keywords"]))
