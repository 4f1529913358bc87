from tpumix.infer.catalog import mix_catalog  # noqa: F401
from tpumix.infer.mixer import SongMixer, mix_song_smooth  # noqa: F401
