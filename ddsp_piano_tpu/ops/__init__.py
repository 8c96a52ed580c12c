"""L0 signal-processing ops: pure JAX tensor functions."""

from ddsp_piano_tpu.ops.core import (  # noqa: F401
    angular_cumsum,
    cross_fade,
    exp_sigmoid,
    exp_tanh,
    f32,
    get_harmonic_frequencies,
    get_inharmonic_freq,
    hann_window,
    hz_to_midi,
    linear_resample,
    make_iterable,
    midi_to_hz,
    pad_or_trim_to_expected_length,
    positive_tanh,
    remove_above_nyquist,
    resample,
    safe_divide,
    safe_log,
    upsample_with_windows,
)
from ddsp_piano_tpu.ops.filters import (  # noqa: F401
    apply_window_to_impulse_response,
    crop_and_compensate_delay,
    fft_convolve,
    frequency_filter,
    frequency_impulse_response,
    get_fft_size,
    overlap_and_add,
)
from ddsp_piano_tpu.ops.oscillator import (  # noqa: F401
    FramewiseOscControls,
    framewise_final_phase,
    framewise_osc_controls,
    harmonic_synthesis,
    oscillator_bank_envelopes,
    render_framewise,
)
from ddsp_piano_tpu.ops.spectral import (  # noqa: F401
    compute_loudness,
    compute_mag,
    compute_mel,
    frame,
    mean_difference,
    multi_scale_spectral_loss,
    stft,
)
from ddsp_piano_tpu.ops.fdn import (  # noqa: F401
    DEFAULT_DELAYS_ALLPASS,
    DEFAULT_DELAY_VALUES,
    FDNParams,
    fdn_ir,
    fdn_late_ir,
    fdn_reverb_signal,
    householder_mixing_matrix,
)
