"""M17 digital voice: IQ capture -> audible WAV.

End-to-end parity demo for the reference m17_decoder
(``decoder_modules/m17_decoder/src/m17dsp.h``): 4FSK GFSK demod ->
symbol slice -> frame sync -> LSF callsigns + stream voice bits ->
codec2 3200 vocoding (system libcodec2 via ctypes) -> 8 kHz WAV.

Usage:
    python examples/m17_voice.py                 # self-contained demo:
        synthesizes an M17 transmission (tone program vocoded through
        codec2), writes /tmp/m17_demo_iq.wav, decodes it back to
        /tmp/m17_voice.wav and prints the link setup + audio stats.
    python examples/m17_voice.py --iq CAP.wav --out VOICE.wav
        decode an existing baseband IQ capture (48 kHz, 4800 baud M17).
"""

import argparse
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # host-side decode chain

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sdrtpu.decoders.m17 import (  # noqa: E402
    M17BitSync,
    M17Vocoder,
    encode_lsf_frame,
    encode_stream_frame,
    lsf_content_bits,
    slice_4fsk,
)
from sdrtpu.io import wav  # noqa: E402
from sdrtpu.kernels.mod import GfskMod  # noqa: E402
from sdrtpu.kernels.psk import Gfsk  # noqa: E402

FS = 48000.0
BAUD = 4800.0
SPS = int(FS / BAUD)
DEVIATION = 2400.0  # outermost symbol (+/-3) lands at +/-2400 Hz

# M17 dibit -> normalized 4FSK symbol (+3,+1,-1,-3 scaled to +/-1)
_DIBIT_SYM = {(0, 1): 1.0, (0, 0): 1 / 3, (1, 0): -1 / 3, (1, 1): -1.0}


def bits_to_symbols(bits: np.ndarray) -> np.ndarray:
    b = np.asarray(bits, np.uint8).reshape(-1, 2)
    return np.array([_DIBIT_SYM[(int(m), int(l))] for m, l in b], np.float32)


def synthesize_capture(path: str) -> None:
    """Vocode a tone program through codec2 and modulate it as M17."""
    from sdrtpu.decoders.codec2 import MODE_3200, Codec2

    t = np.arange(16 * 320) / 8000.0
    prog = (5000 * np.sin(2 * np.pi * 250 * t)
            * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(np.int16)
    c2 = Codec2(MODE_3200).encode(prog)

    frames = [encode_lsf_frame("N0CALL", "SP5WWP")]
    lsf_bits = lsf_content_bits("N0CALL", "SP5WWP")
    for fn in range(len(c2) // 16):
        chunk = c2[fn * 16:(fn + 1) * 16]
        vbits = np.unpackbits(np.frombuffer(chunk, np.uint8))
        ci = fn % 6
        frames.append(encode_stream_frame(
            fn, vbits, lich_chunk=lsf_bits[ci * 40:(ci + 1) * 40],
            chunk_idx=ci,
        ))
    # M17 preamble: alternating +3/-3 symbols (dibits 01 11) for sync/CDR
    preamble = np.tile(np.array([0, 1, 1, 1], np.uint8), 240)
    bits = np.concatenate([preamble] + frames + [np.zeros(96, np.uint8)])
    syms = bits_to_symbols(bits)
    mod = GfskMod(SPS, DEVIATION, FS, rrc_tap_count=4 * SPS + 1,
                  rrc_beta=0.5)
    _, iq = mod(mod.init_state(), jnp.asarray(syms))
    wav.write_iq_wav(path, int(FS), np.asarray(iq))
    print(f"synthesized {len(frames)-1} stream frames -> {path}")


def decode_capture(iq_path: str, out_path: str) -> int:
    info, iq = wav.read_iq_wav(iq_path)
    assert abs(info.samplerate - FS) < 1, info.samplerate
    dem = Gfsk(BAUD, FS, DEVIATION, rrc_tap_count=4 * SPS + 1,
               rrc_beta=0.5, omega_gain=1e-4, mu_gain=0.08)
    _, (syms, valid) = dem(dem.init_state(), jnp.asarray(iq))
    symbols = np.asarray(syms)[np.asarray(valid)]
    bits = slice_4fsk(symbols)

    sync = M17BitSync()
    results = sync.process(bits)
    voc = M17Vocoder()
    stream = []
    saw_lsf = False
    for typ, payload in results:
        if typ == "lsf" and payload and payload.get("crc_ok"):
            saw_lsf = True
            print(f"LSF: dst={payload['dst']} src={payload['src']} "
                  f"crc_ok={payload['crc_ok']}")
        elif typ == "stream" and payload is not None:
            stream.append(payload)
    if not saw_lsf:
        # mid-stream join: reassemble the link setup from LICH chunks
        lsf = sync.decoder.lsf_from_lich()
        if lsf and lsf.get("crc_ok"):
            print(f"LSF (from LICH): dst={lsf['dst']} src={lsf['src']} "
                  f"crc_ok={lsf['crc_ok']}")
    audio = voc.vocode(stream)
    if not len(audio):
        print("no voice frames decoded", file=sys.stderr)
        return 1
    wav.write_wav(out_path, 8000, audio)
    rms = float(np.sqrt(np.mean(audio**2)))
    print(f"{len(stream)} voice frames -> {len(audio)} samples @ 8 kHz "
          f"(rms {rms:.3f}) -> {out_path}")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iq", help="input IQ WAV (48 kHz M17 baseband)")
    ap.add_argument("--out", default="/tmp/m17_voice.wav")
    args = ap.parse_args()
    iq_path = args.iq
    if iq_path is None:
        iq_path = "/tmp/m17_demo_iq.wav"
        synthesize_capture(iq_path)
    return decode_capture(iq_path, args.out)


if __name__ == "__main__":
    sys.exit(main())
