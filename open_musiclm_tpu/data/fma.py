"""FMA metadata filtering (reference scripts/preprocess_data.py:44-62).

Drops low-engagement experimental tracks from the FMA dataset: tracks whose
``genres_all`` contains genre 38 ("Experimental") AND have <= 1000 listens or
<= 5 favorites. Dependency-free parser for FMA's two-row-header
``tracks.csv`` (the reference uses pandas, which this image doesn't ship).
"""

from __future__ import annotations

import ast
import csv
from pathlib import Path
from typing import List

EXPERIMENTAL_GENRE = 38


def fma_ignore_files(
    metadata_folder: str,
    *,
    genre: int = EXPERIMENTAL_GENRE,
    max_listens: int = 1000,
    max_favorites: int = 5,
) -> List[str]:
    """Returns file names like '000123.mp3' to skip."""
    path = Path(metadata_folder) / "tracks.csv"
    with open(path, newline="", encoding="utf-8") as f:
        reader = csv.reader(f)
        group_row = next(reader)  # e.g. ['', 'album', ..., 'track', ...]
        field_row = next(reader)  # e.g. ['', 'comments', ..., 'genres_all', ...]
        # forward-fill the group row (pandas multi-header convention)
        filled = []
        cur = ""
        for g in group_row:
            cur = g if g else cur
            filled.append(cur)
        cols = {}
        for i, (g, name) in enumerate(zip(filled, field_row)):
            if g == "track" and name in ("genres_all", "listens", "favorites"):
                cols[name] = i
        missing = {"genres_all", "listens", "favorites"} - set(cols)
        if missing:
            raise ValueError(f"tracks.csv missing track columns: {missing}")

        ignore = []
        for row in reader:
            if not row or not row[0].strip().isdigit():
                continue
            track_id = int(row[0])
            try:
                genres = ast.literal_eval(row[cols["genres_all"]] or "[]")
                listens = int(float(row[cols["listens"]] or 0))
                favorites = int(float(row[cols["favorites"]] or 0))
            except (ValueError, SyntaxError):
                continue
            if genre in genres and (listens <= max_listens or favorites <= max_favorites):
                ignore.append(f"{track_id:06d}.mp3")
        return ignore
