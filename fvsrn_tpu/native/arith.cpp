// Adaptive binary arithmetic (range) coder + TThresh-style bitplane
// codec for fvsrn_tpu's compression tower.
//
// The reference vendors TThresh's arithmetic coder + RLE
// (/root/reference/compression/src/compression.cpp:1-821 wraps the
// tthresh codec); this is a from-scratch implementation of the same
// *idea* built on the standard LZMA-style binary range coder (public
// textbook construction: 32-bit range, 64-bit low with carry cache,
// 12-bit adaptive probabilities) with significance/refinement/sign
// contexts per bitplane -- the zero runs the paper handles with RLE
// are absorbed by the per-plane significance contexts (a run of zeros
// costs a fraction of a bit per symbol once the model adapts).
//
// Exposed via ctypes (fvsrn_tpu/compression.py); no third-party code.
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kTop = 1u << 24;
constexpr int kProbBits = 12;
constexpr uint16_t kProbOne = 1u << kProbBits;
constexpr int kAdaptShift = 5;

struct Encoder {
  uint64_t low = 0;
  uint32_t range = 0xFFFFFFFFu;
  uint8_t cache = 0;
  int64_t pending = 0;
  bool first = true;
  std::vector<uint8_t>* out;

  void shift_low() {
    if ((uint32_t)low < 0xFF000000u || (low >> 32) != 0) {
      uint8_t carry = (uint8_t)(low >> 32);
      if (!first) out->push_back(cache + carry);
      first = false;
      for (; pending > 0; --pending) out->push_back((uint8_t)(0xFF + carry));
      cache = (uint8_t)((uint32_t)low >> 24);
    } else {
      ++pending;
    }
    low = ((uint32_t)low) << 8;
  }

  void encode(int bit, uint16_t& prob) {
    uint32_t bound = (range >> kProbBits) * prob;
    if (!bit) {
      range = bound;
      prob += (kProbOne - prob) >> kAdaptShift;
    } else {
      low += bound;
      range -= bound;
      prob -= prob >> kAdaptShift;
    }
    while (range < kTop) {
      shift_low();
      range <<= 8;
    }
  }

  void finish() {
    for (int i = 0; i < 5; ++i) shift_low();
  }
};

struct Decoder {
  uint32_t range = 0xFFFFFFFFu;
  uint32_t code = 0;
  const uint8_t* in;
  const uint8_t* end;

  uint8_t next() { return in < end ? *in++ : 0; }

  void init() {
    for (int i = 0; i < 4; ++i) code = (code << 8) | next();
  }

  int decode(uint16_t& prob) {
    uint32_t bound = (range >> kProbBits) * prob;
    int bit;
    if (code < bound) {
      bit = 0;
      range = bound;
      prob += (kProbOne - prob) >> kAdaptShift;
    } else {
      bit = 1;
      code -= bound;
      range -= bound;
      prob -= prob >> kAdaptShift;
    }
    while (range < kTop) {
      code = (code << 8) | next();
      range <<= 8;
    }
    return bit;
  }
};

struct PlaneModel {
  // significance context per plane (zero runs adapt here), refinement,
  // sign -- the context split of embedded bitplane coders
  uint16_t sig[64];
  uint16_t ref;
  uint16_t sign;
  PlaneModel() {
    for (auto& p : sig) p = kProbOne / 2;
    ref = kProbOne / 2;
    sign = kProbOne / 2;
  }
};

}  // namespace

extern "C" {

// Encode n magnitudes (uint64, already bitplane-cut/shifted) + signs
// over `nbits` planes MSB-first. Returns payload bytes, or -1 if the
// output capacity is insufficient.
int fv_ac_encode_planes(const uint64_t* mag, const uint8_t* sign, int n,
                        int nbits, uint8_t* out_buf, int out_cap) {
  std::vector<uint8_t> out;
  out.reserve((size_t)n / 4 + 64);
  Encoder enc;
  enc.out = &out;
  PlaneModel m;
  std::vector<uint8_t> significant((size_t)n, 0);
  for (int p = nbits - 1; p >= 0; --p) {
    uint16_t& sig_ctx = m.sig[p < 64 ? p : 63];
    for (int i = 0; i < n; ++i) {
      int bit = (int)((mag[i] >> p) & 1u);
      if (!significant[i]) {
        enc.encode(bit, sig_ctx);
        if (bit) {
          significant[i] = 1;
          enc.encode(sign[i] ? 1 : 0, m.sign);
        }
      } else {
        enc.encode(bit, m.ref);
      }
    }
  }
  enc.finish();
  if ((int)out.size() > out_cap) return -1;
  std::memcpy(out_buf, out.data(), out.size());
  return (int)out.size();
}

int fv_ac_decode_planes(const uint8_t* in_buf, int in_len, uint64_t* mag,
                        uint8_t* sign, int n, int nbits) {
  Decoder dec;
  dec.in = in_buf;
  dec.end = in_buf + in_len;
  dec.init();
  PlaneModel m;
  std::vector<uint8_t> significant((size_t)n, 0);
  std::memset(mag, 0, sizeof(uint64_t) * (size_t)n);
  std::memset(sign, 0, (size_t)n);
  for (int p = nbits - 1; p >= 0; --p) {
    uint16_t& sig_ctx = m.sig[p < 64 ? p : 63];
    for (int i = 0; i < n; ++i) {
      int bit;
      if (!significant[i]) {
        bit = dec.decode(sig_ctx);
        if (bit) {
          significant[i] = 1;
          sign[i] = (uint8_t)dec.decode(m.sign);
        }
      } else {
        bit = dec.decode(m.ref);
      }
      if (bit) mag[i] |= (uint64_t)1 << p;
    }
  }
  return 0;
}

}  // extern "C"
