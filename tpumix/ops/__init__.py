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
