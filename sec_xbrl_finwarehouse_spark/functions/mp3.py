"""MPEG audio (MP3) frame-header parser — stdlib-only, header-level.

Walks the frame sequence of an MPEG-1/2/2.5 Layer I/II/III stream and
returns REAL container metadata: sample rate, channel mode, per-frame
bitrates (so VBR average bitrate and exact duration are computed from
the actual frames, not the first header), frame count and sample
count. An ID3v2 tag at the start is skipped via its synchsafe size.

PCM decode (Huffman + IMDCT + polyphase synthesis) is intentionally
out of scope — this parser powers the ``audio_metadata`` operator,
where duration/bitrate/layout are the queried facts; sample-level
features for MP3 remain the flagged fake in ``_pcm_from_bytes``.

Reference parity: the reference stores media metadata columns only
(schema.sql media tables); this derives them from the actual bytes.
"""

from __future__ import annotations

# bitrate_kbps[(version_group, layer)][bitrate_index]; 0 = free format
_BITRATES = {
    # MPEG-1
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
             416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320],
    # MPEG-2 / 2.5
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160],
}

_SAMPLE_RATES = {  # by version bits (00=2.5, 10=2, 11=1)
    3: [44100, 48000, 32000],   # MPEG-1
    2: [22050, 24000, 16000],   # MPEG-2
    0: [11025, 12000, 8000],    # MPEG-2.5
}

_VERSION_NAME = {3: "1", 2: "2", 0: "2.5"}

# samples per frame [(version_group, layer)]
_SPF = {(1, 1): 384, (1, 2): 1152, (1, 3): 1152,
        (2, 1): 384, (2, 2): 1152, (2, 3): 576}


def _skip_id3v2(b: bytes) -> int:
    """Byte offset past a leading ID3v2 tag (0 if none). Tag size is a
    28-bit synchsafe integer, exclusive of the 10-byte header."""
    if b[:3] != b"ID3" or len(b) < 10:
        return 0
    size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) \
        | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
    return 10 + size


def _frame_at(b: bytes, i: int) -> dict | None:
    """Parse one frame header at offset ``i``; None if not a valid
    sync/header combination."""
    if i + 4 > len(b):
        return None
    h = int.from_bytes(b[i:i + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:          # 11-bit sync
        return None
    version_bits = (h >> 19) & 0x3
    layer_bits = (h >> 17) & 0x3
    if version_bits == 1 or layer_bits == 0:
        return None                          # reserved
    layer = 4 - layer_bits                   # 3->I ... 1->III
    vgroup = 1 if version_bits == 3 else 2
    bitrate_idx = (h >> 12) & 0xF
    rate_idx = (h >> 10) & 0x3
    if bitrate_idx in (0, 0xF) or rate_idx == 3:
        return None                          # free-format / bad
    bitrate = _BITRATES[(vgroup, layer)][bitrate_idx] * 1000
    sample_rate = _SAMPLE_RATES[version_bits][rate_idx]
    padding = (h >> 9) & 0x1
    channel_mode = (h >> 6) & 0x3            # 3 = mono
    if layer == 1:
        frame_len = (12 * bitrate // sample_rate + padding) * 4
    else:
        per = 144 if (layer == 2 or vgroup == 1) else 72
        frame_len = per * bitrate // sample_rate + padding
    if frame_len <= 4:
        return None
    return {
        "version": _VERSION_NAME[version_bits],
        "layer": layer,
        "bitrate": bitrate,
        "sample_rate": sample_rate,
        "channels": 1 if channel_mode == 3 else 2,
        "frame_len": frame_len,
        "samples": _SPF[(vgroup, layer)],
    }


def parse_mp3(payload: bytes) -> dict | None:
    """Walk every frame; return aggregate metadata or None when the
    payload is not an MPEG audio stream (fewer than 2 coherent frames
    — a lone false sync in arbitrary bytes is common, a chain is not).

    ``duration_ms`` and ``avg_bitrate_kbps`` come from the per-frame
    walk, so VBR streams are measured, not guessed from frame one."""
    i = _skip_id3v2(payload)
    frames = 0
    samples = 0
    bitrate_sum = 0
    first = None
    while True:
        f = _frame_at(payload, i)
        if f is None:
            break
        if first is None:
            first = f
        elif (f["sample_rate"] != first["sample_rate"]
              or f["layer"] != first["layer"]):
            break                            # stream parameters changed: stop
        frames += 1
        samples += f["samples"]
        bitrate_sum += f["bitrate"]
        i += f["frame_len"]
    if frames < 2 or first is None:
        return None
    return {
        "codec": f"mp3v{first['version']}L{first['layer']}",
        "sample_rate": first["sample_rate"],
        "channels": first["channels"],
        "n_frames": frames,
        "n_samples": samples,
        "duration_ms": int(round(samples * 1000.0 / first["sample_rate"])),
        "avg_bitrate_kbps": int(round(bitrate_sum / frames / 1000.0)),
    }
