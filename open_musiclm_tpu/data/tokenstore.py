"""Preprocessed-token store: sqlite with numpy-blob columns.

Binary-compatible with the reference's ``preprocessed.db`` layout
(data.py:31-55 numpy adapter via np.save bytes; preprocess.py:200 schema
``tokens(idx, path, clap array, semantic array, coarse array, fine array)``)
so existing preprocessed datasets load unchanged. Values are stored uint16
(preprocess.py:270-276).

The reference's known-fragile spot — every preprocessing rank opening the
same sqlite file (SURVEY.md 5.2) — is fixed here: each writer rank appends
to its own shard ``preprocessed.rank{r}.db`` and readers attach all shards.
"""

from __future__ import annotations

import io
import sqlite3
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np


def _adapt_array(arr: np.ndarray) -> sqlite3.Binary:
    out = io.BytesIO()
    np.save(out, arr)
    out.seek(0)
    return sqlite3.Binary(out.read())


def _convert_array(blob: bytes) -> np.ndarray:
    return np.load(io.BytesIO(blob))


sqlite3.register_adapter(np.ndarray, _adapt_array)
sqlite3.register_converter("array", _convert_array)

SCHEMA = (
    "CREATE TABLE IF NOT EXISTS tokens("
    "idx integer primary key, path text, clap array, semantic array, "
    "coarse array, fine array)"
)


class TokenStore:
    """One sqlite shard."""

    def __init__(self, path: str, create: bool = False):
        self.path = str(path)
        # check_same_thread=False: reads come from the batch_iterator's
        # thread pool; sqlite connections are serialized-safe for our
        # read-mostly access (single writer rank per shard).
        self.conn = sqlite3.connect(
            self.path, detect_types=sqlite3.PARSE_DECLTYPES, check_same_thread=False
        )
        self.cursor = self.conn.cursor()
        if create:
            self.cursor.execute(SCHEMA)
            self.conn.commit()

    def has(self, idx: int) -> bool:
        rows = self.conn.execute("SELECT idx FROM tokens WHERE idx=?", (idx,)).fetchall()
        return len(rows) > 0

    def put(self, idx: int, path: str, clap, semantic, coarse, fine) -> None:
        self.cursor.execute(
            "INSERT OR REPLACE INTO tokens VALUES (?, ?, ?, ?, ?, ?)",
            (
                idx,
                path,
                np.asarray(clap).astype(np.uint16),
                np.asarray(semantic).astype(np.uint16),
                np.asarray(coarse).astype(np.uint16),
                np.asarray(fine).astype(np.uint16),
            ),
        )
        self.conn.commit()

    def ids(self) -> List[int]:
        return [r[0] for r in self.conn.execute("SELECT idx FROM tokens").fetchall()]

    def get(self, idx: int, fields: Sequence[str]) -> Tuple[np.ndarray, ...]:
        cols = ", ".join(fields)
        # conn.execute creates a fresh cursor; the connection serializes
        # cross-thread access internally
        row = self.conn.execute(
            f"SELECT {cols} FROM tokens WHERE idx = ?", (idx,)
        ).fetchone()
        return tuple(np.asarray(c) for c in row)

    def close(self):
        self.conn.close()


class ShardedTokenStore:
    """Reader over one or many shards (single-file reference DBs included)."""

    def __init__(self, folder: str):
        folder = Path(folder)
        paths = sorted(folder.glob("preprocessed*.db"))
        if not paths and folder.suffix == ".db":
            paths = [folder]
        assert paths, f"no preprocessed*.db found in {folder}"
        self.shards = [TokenStore(str(p)) for p in paths]
        self.index: List[Tuple[int, int]] = []  # (shard, idx)
        for si, shard in enumerate(self.shards):
            for idx in shard.ids():
                self.index.append((si, idx))

    def __len__(self) -> int:
        return len(self.index)

    def get(self, i: int, fields: Sequence[str]) -> Tuple[np.ndarray, ...]:
        si, idx = self.index[i]
        return self.shards[si].get(idx, fields)


def writer_for_rank(results_folder: str, rank: int, world: int) -> TokenStore:
    """Per-rank shard writer (no shared-writer races)."""
    folder = Path(results_folder)
    folder.mkdir(parents=True, exist_ok=True)
    name = "preprocessed.db" if world == 1 else f"preprocessed.rank{rank}.db"
    return TokenStore(str(folder / name), create=True)
