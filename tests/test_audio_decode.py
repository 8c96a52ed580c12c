"""General (non-wav) audio decode fallback (VERDICT round-1 #10).

The reference decodes arbitrary formats through pydub, which itself shells
out to ffmpeg (/root/reference/ddsp_piano/utils/io_utils.py:50-74). Here
non-wav inputs go straight to an ffmpeg subprocess streaming f32le. This
image ships no ffmpeg binary, so the subprocess plumbing and the pipeline
integration are exercised against a stub `ffmpeg` on PATH that performs a
real decode (raw f32le fixture + linear resample); the no-ffmpeg error
path is tested with an empty PATH.
"""

import os
import stat
import sys
import textwrap

import numpy as np
import pytest

from ddsp_piano_tpu.data import audio_io

SR_FIXTURE = 44100


def _write_mp3_fixture(path, duration=1.0, freq=220.0):
    """A fake 'mp3': raw f32le mono sine at 44.1 kHz (the stub ffmpeg's
    input format)."""
    t = np.arange(int(duration * SR_FIXTURE)) / SR_FIXTURE
    audio = (0.5 * np.sin(2 * np.pi * freq * t)).astype('<f4')
    with open(path, 'wb') as f:
        f.write(audio.tobytes())
    return audio.astype(np.float32)


@pytest.fixture()
def stub_ffmpeg(tmp_path, monkeypatch):
    """Install a PATH-visible `ffmpeg` that decodes the raw-f32le fixture
    and honors `-ar` via linear resampling."""
    bin_dir = tmp_path / 'bin'
    bin_dir.mkdir()
    stub = bin_dir / 'ffmpeg'
    stub.write_text(textwrap.dedent(f"""\
        #!{sys.executable}
        import sys
        import numpy as np
        args = sys.argv[1:]
        src = args[args.index('-i') + 1]
        rate = int(args[args.index('-ar') + 1])
        assert 'f32le' in args and '-ac' in args
        audio = np.frombuffer(open(src, 'rb').read(), '<f4')
        n_out = int(len(audio) / {SR_FIXTURE} * rate)
        x_out = np.linspace(0.0, len(audio) - 1.0, n_out)
        out = np.interp(x_out, np.arange(len(audio)), audio)
        sys.stdout.buffer.write(out.astype('<f4').tobytes())
        """))
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv('PATH',
                       f"{bin_dir}{os.pathsep}{os.environ.get('PATH', '')}")
    return bin_dir


def test_wav_path_never_touches_ffmpeg(tmp_path, monkeypatch):
    monkeypatch.setenv('PATH', str(tmp_path / 'nothing-here'))
    wav = str(tmp_path / 'a.wav')
    sine = 0.3 * np.sin(np.linspace(0, 220 * 2 * np.pi, 16000))
    audio_io.write_wav(wav, sine, 16000)
    out = audio_io.load_audio_as_signal(wav, 16000)
    assert len(out) == 16000


def test_non_wav_without_ffmpeg_raises_clearly(tmp_path, monkeypatch):
    monkeypatch.setenv('PATH', str(tmp_path / 'nothing-here'))
    mp3 = str(tmp_path / 'a.mp3')
    _write_mp3_fixture(mp3)
    with pytest.raises(RuntimeError, match='ffmpeg'):
        audio_io.load_audio_as_signal(mp3, 16000)


def test_ffmpeg_fallback_decodes_and_resamples(tmp_path, stub_ffmpeg):
    mp3 = str(tmp_path / 'a.mp3')
    fixture = _write_mp3_fixture(mp3, duration=1.0, freq=220.0)
    out = audio_io.load_audio_as_signal(mp3, 16000)
    assert out.dtype == np.float32
    assert len(out) == 16000
    # Same 220 Hz sine after the stub's resample.
    t = np.arange(16000) / 16000.0
    ref = 0.5 * np.sin(2 * np.pi * 220.0 * t)
    corr = np.corrcoef(out, ref)[0, 1]
    assert corr > 0.99, corr
    assert np.abs(out).max() == pytest.approx(np.abs(fixture).max(),
                                              rel=0.05)


def test_training_pipeline_loads_mp3_tracks(tmp_path, stub_ffmpeg):
    """End-to-end: a MAESTRO-layout dataset whose audio is mp3 feeds the
    training pipeline through the ffmpeg fallback."""
    import pandas as pd

    from ddsp_piano_tpu.data import midi, pipeline

    data_dir = tmp_path / 'maestro'
    data_dir.mkdir()
    _write_mp3_fixture(str(data_dir / 'track.mp3'), duration=4.0)
    midi.write_midi(str(data_dir / 'track.mid'),
                    [midi.Note(60, 80, 0.5, 2.0),
                     midi.Note(64, 70, 1.0, 3.0)])
    pd.DataFrame([{'split': 'train', 'year': 2018,
                   'audio_filename': 'track.mp3',
                   'midi_filename': 'track.mid'}]).to_csv(
        str(data_dir / 'maestro-v3.0.0.csv'), index=False)

    it = pipeline.get_training_dataset(str(data_dir), batch_size=2,
                                       duration=1.0, max_polyphony=4,
                                       sample_rate=16000)
    batch = next(iter(it))
    assert batch['audio'].shape == (2, 16000)
    assert np.isfinite(batch['audio']).all()
    assert float(np.abs(batch['audio']).max()) > 0.1
