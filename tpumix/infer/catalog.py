"""Catalogue mixing driver: mix every song in a songlist with disk I/O
prefetched on a background thread so track loading for song k+1 overlaps the
device compute for song k.

Replaces the reference's notebook loop (reference inference.ipynb cell 9:
load stems -> mix_song_smooth -> sum -> normalise -> write ``{song}_mixed.wav``
and naive ``{song}_sum.wav``), which is fully sequential.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, List, Optional, Sequence

import numpy as np

from tpumix.data import wavio
from tpumix.data.loaders import load_tracks, load_tracks_musdb18

STEMS = ("bass", "drums", "vocals", "other")


def mix_catalog(
    mixer,
    base_dir: str,
    songlist: Sequence[str],
    out_dir: str,
    layout: str = "medleydb",
    naive_sum: bool = False,
    prefetch: int = 2,
    sr: int = 44100,
) -> List[str]:
    """Mix each song; returns the written mixed-wav paths."""
    os.makedirs(out_dir, exist_ok=True)
    loader = load_tracks_musdb18 if layout == "musdb18" else load_tracks

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    _END = object()

    def producer():
        try:
            for song in songlist:
                tracks = loader(base_dir, song, tracklist=STEMS, sr=sr)
                q.put((song, tracks, None))
        except BaseException as e:
            q.put((None, None, e))
            return
        q.put(_END)

    threading.Thread(target=producer, daemon=True).start()

    written = []
    while True:
        item = q.get()
        if item is _END:
            break
        song, tracks, err = item
        if err is not None:
            raise err
        mixed = mixer.mix_song(tracks)
        out_path = os.path.join(out_dir, f"{song}_mixed.wav")
        wavio.write(out_path, np.asarray(mixed).T, sr)
        written.append(out_path)
        if naive_sum:
            total = sum(np.asarray(v, dtype=np.float32) for v in tracks.values())
            peak = float(np.max(np.abs(total))) or 1.0
            wavio.write(os.path.join(out_dir, f"{song}_sum.wav"), (total / peak).T, sr)
    return written
