#!/usr/bin/env python3
"""Write the committed WAV fixture decoded by MultimodalSpec.

Uses python's stdlib `wave` module — an INDEPENDENT RIFF/WAVE encoder from
the JVM's javax.sound.sampled — so graft.operators.Multimodal.decodeWav is
verified against a second implementation, not its own inverse.

The clip is 400 mono PCM16LE samples at 8 kHz with the integer law
x_i = ((31 * i * i + 7 * i) mod 65521) - 32760 (distinct from the m05
synthetic law on purpose). Prints the expected decode features.
"""
import os
import wave

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src", "test", "resources", "graft", "tone.wav")

N = 400
samples = [((31 * i * i + 7 * i) % 65521) - 32760 for i in range(N)]
assert all(-32768 <= x <= 32767 for x in samples)

frames = b"".join(x.to_bytes(2, "little", signed=True) for x in samples)
with wave.open(OUT, "wb") as w:
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(8000)
    w.writeframes(frames)

print("n_samples =", N)
print("sample_sum =", sum(samples))
print("energy     =", sum(x * x for x in samples))
print("peak       =", max(abs(x) for x in samples))
print("bytes      =", os.path.getsize(OUT))
