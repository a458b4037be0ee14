// Host-side native kernels for the streaming runtime.
//
// The reference's ingest path unpacks BCI2000 GenericSignal packets with
// Python struct + numpy transpose/astype (local/units.py:78-82), and its
// replay amplifier serializes packets via struct.pack(*payload.tolist())
// (development_amplifier.py:23-25) — both allocate-and-copy several times
// per 40 ms packet.  These C++ kernels do each direction in a single pass.
//
// Layout contract (BCI2000 GenericSignal):
//   header: uint8 descriptor=4, uint8 supplement=1, uint8 dtype=2 (float32),
//           uint16 n_channels, uint16 n_samples   (little-endian, packed)
//   payload: float32, channel-major [n_channels][n_samples]
//
// Build: make -C dss_tpu/native   (produces libdssnative.so)

#include <cstdint>
#include <cstring>

extern "C" {

struct PacketHeader {
    uint8_t descriptor;
    uint8_t supplement;
    uint8_t dtype;
    uint16_t n_channels;
    uint16_t n_samples;
};

// Serialize one packet: data is sample-major [n_samples][n_channels]
// (the natural orientation of the replay buffer); written channel-major.
// Returns the number of bytes written.
int64_t dss_pack_packet(const float* data, int32_t n_channels,
                        int32_t n_samples, uint8_t* out) {
    uint8_t* p = out;
    *p++ = 4;  // descriptor: data
    *p++ = 1;  // supplement: GenericSignal
    *p++ = 2;  // dtype: float32
    uint16_t ch = static_cast<uint16_t>(n_channels);
    uint16_t sa = static_cast<uint16_t>(n_samples);
    std::memcpy(p, &ch, 2); p += 2;
    std::memcpy(p, &sa, 2); p += 2;
    float* payload = reinterpret_cast<float*>(p);
    for (int32_t c = 0; c < n_channels; ++c) {
        const float* col = data + c;
        float* row = payload + static_cast<int64_t>(c) * n_samples;
        for (int32_t s = 0; s < n_samples; ++s) {
            row[s] = col[static_cast<int64_t>(s) * n_channels];
        }
    }
    return 7 + static_cast<int64_t>(n_channels) * n_samples * 4;
}

// Parse a packet header; returns 0 on success, -1 on malformed input.
int32_t dss_packet_header(const uint8_t* in, int64_t n_bytes,
                          int32_t* n_channels, int32_t* n_samples) {
    if (n_bytes < 7) return -1;
    if (in[0] != 4 || in[1] != 1 || in[2] != 2) return -1;
    uint16_t ch, sa;
    std::memcpy(&ch, in + 3, 2);
    std::memcpy(&sa, in + 5, 2);
    if (n_bytes < 7 + static_cast<int64_t>(ch) * sa * 4) return -1;
    *n_channels = ch;
    *n_samples = sa;
    return 0;
}

// Deserialize payload into sample-major float64 [n_samples][n_channels]
// (transpose + widen in one pass — what the connector feeds the device).
int32_t dss_unpack_packet(const uint8_t* in, int64_t n_bytes, double* out) {
    int32_t ch, sa;
    if (dss_packet_header(in, n_bytes, &ch, &sa) != 0) return -1;
    const float* payload = reinterpret_cast<const float*>(in + 7);
    for (int32_t c = 0; c < ch; ++c) {
        const float* row = payload + static_cast<int64_t>(c) * sa;
        double* col = out + c;
        for (int32_t s = 0; s < sa; ++s) {
            col[static_cast<int64_t>(s) * ch] = static_cast<double>(row[s]);
        }
    }
    return 0;
}

// float [-1, 1] -> int16 PCM with round-half-away and saturation (the SoX
// sink's conversion, hoisted out of numpy).
void dss_float_to_pcm16(const float* in, int64_t n, int16_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        float v = in[i] * 32767.0f;
        v = v >= 0.0f ? v + 0.5f : v - 0.5f;
        if (v > 32767.0f) v = 32767.0f;
        if (v < -32768.0f) v = -32768.0f;
        out[i] = static_cast<int16_t>(v);
    }
}

}  // extern "C"
