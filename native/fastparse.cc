// Fast FASTA/FASTQ scanner + 2-bit encoder (gatekeeper IO hot path).
//
// Native replacement for the per-record Python parsing loop, playing the
// role of the reference's C++ loaders (gatekeeperCreate.C loadFASTQ /
// loadReads at /root/reference/src/stores/gatekeeperCreate.C:182,336 —
// re-designed, not ported: single-pass scan over an mmap'd buffer
// emitting a concatenated 2-bit-able code stream plus per-record
// offsets; N handling and packing stay in numpy/JAX land).
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>

namespace {

// ASCII -> code; 255 = invalid base (N etc.), used for split-at-N.
struct CodeTable {
  uint8_t t[256];
  CodeTable() {
    memset(t, 255, sizeof(t));
    t['A'] = t['a'] = 0;
    t['C'] = t['c'] = 1;
    t['G'] = t['g'] = 2;
    t['T'] = t['t'] = 3;
  }
};
const CodeTable kCodes;

}  // namespace

extern "C" {

// Scan a FASTA or FASTQ buffer.
//
//   buf, n          : input text (uncompressed)
//   codes_out       : caller buffer of size >= n; receives base codes
//                     (0..3, 255 for ambiguity) for all records,
//                     concatenated
//   rec_code_off    : [max_records+1] start offset of each record's codes
//   name_off,name_len: [max_records] span of each record's name in buf
//   max_records     : capacity
//
// Returns the number of records parsed, or -1 on malformed input, or
// -2 if max_records was exceeded.
long long fastx_scan_q(const uint8_t* buf, long long n, uint8_t* codes_out,
                       uint8_t* quals_out, long long* rec_code_off,
                       long long* name_off, long long* name_len,
                       long long max_records);

long long fastx_scan(const uint8_t* buf, long long n, uint8_t* codes_out,
                     long long* rec_code_off, long long* name_off,
                     long long* name_len, long long max_records) {
  return fastx_scan_q(buf, n, codes_out, nullptr, rec_code_off, name_off,
                      name_len, max_records);
}

// As fastx_scan, but also emits per-base phred qualities (char - 33)
// into quals_out (caller size >= n) when non-null; FASTA records get 0
// ("unknown").  The quality plane feeds ReadSet's QV features (the
// reference stores QVs in the gkStore blob, gkStore.H:305-313).
long long fastx_scan_q(const uint8_t* buf, long long n, uint8_t* codes_out,
                       uint8_t* quals_out, long long* rec_code_off,
                       long long* name_off, long long* name_len,
                       long long max_records) {
  long long i = 0, nrec = 0, cpos = 0;
  // skip leading blank lines
  while (i < n && (buf[i] == '\n' || buf[i] == '\r')) i++;
  if (i >= n) return 0;
  const bool fastq = buf[i] == '@';
  if (!fastq && buf[i] != '>') return -1;

  while (i < n) {
    if (buf[i] == '\n' || buf[i] == '\r') { i++; continue; }
    if (buf[i] != (fastq ? '@' : '>')) return -1;
    if (nrec >= max_records) return -2;
    i++;  // past marker
    long long ns = i;
    while (i < n && buf[i] != '\n' && buf[i] != ' ' && buf[i] != '\t') i++;
    name_off[nrec] = ns;
    name_len[nrec] = i - ns;
    while (i < n && buf[i] != '\n') i++;  // rest of header
    i++;
    rec_code_off[nrec] = cpos;
    if (fastq) {
      long long seq_len = 0;
      while (i < n && buf[i] != '\n') codes_out[cpos + seq_len++] = kCodes.t[buf[i++]];
      i++;                                   // newline
      if (i >= n || buf[i] != '+') return -1;
      while (i < n && buf[i] != '\n') i++;   // '+' line
      i++;
      long long q = 0;
      while (i < n && q < seq_len) {          // qualities, may not contain \n
        uint8_t c = buf[i];
        if (c != '\n' && c != '\r') {
          if (quals_out) quals_out[cpos + q] = c >= 33 ? c - 33 : 0;
          q++;
        }
        i++;
      }
      if (q != seq_len) return -1;
      cpos += seq_len;
    } else {
      while (i < n && buf[i] != '>') {
        uint8_t c = buf[i++];
        if (c == '\n' || c == '\r') continue;
        if (quals_out) quals_out[cpos] = 0;
        codes_out[cpos++] = kCodes.t[c];
      }
    }
    nrec++;
  }
  rec_code_off[nrec] = cpos;
  return nrec;
}

}  // extern "C"
