from tpumix.ops.stft import (  # noqa: F401
    amplitude_to_db,
    dft_bases,
    frame_signal,
    hann_window,
    spectrogram_features,
    spectrogram_features_tm,
    stft_magnitude,
)
from tpumix.ops.gain import (  # noqa: F401
    amplitude_to_db_scalar,
    augment_audio,
    augment_features_db,
    db_to_amplitude,
    dummy_mix_db,
    spectral_mix,
    stereo_to_mono,
)
from tpumix.ops.smoothing import (  # noqa: F401
    default_savgol_window,
    interpolate_mask,
    interpolate_mask_np,
    savgol_smooth,
    savgol_smooth_jax,
)
from tpumix.ops.istft import (  # noqa: F401
    istft,
    mix_in_spectrogram_domain,
    reconstruct_from_magnitude,
    stft_complex,
)
from tpumix.ops.loudness import (  # noqa: F401
    Meter,
    integrated_loudness,
    integrated_loudness_jax,
    normalize_loudness,
)
