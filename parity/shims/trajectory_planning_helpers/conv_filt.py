import numpy as np


def conv_filt(signal, filt_window, closed):
    """Moving-average filter (tph conv_filt): odd window; closed signals use
    circular padding, unclosed keep raw endpoints and progressively smaller
    centered windows toward the edges."""
    if filt_window % 2 == 0:
        raise ValueError("Window width of moving average filter must be odd!")
    signal = np.asarray(signal, float)
    w_half = filt_window // 2
    if closed:
        sig_ext = np.concatenate((signal[-w_half:], signal, signal[:w_half]))
        return np.convolve(sig_ext, np.ones(filt_window) / filt_window,
                           mode="same")[w_half:-w_half]
    out = np.copy(signal)
    out[w_half:-w_half] = np.convolve(
        signal, np.ones(filt_window) / filt_window, mode="same")[w_half:-w_half]
    for i in range(1, w_half):
        out[i] = np.mean(signal[: i * 2 + 1])
        out[-i - 1] = np.mean(signal[-i * 2 - 1:])
    return out
