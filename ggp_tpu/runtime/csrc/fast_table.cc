// fast_table.cc — mmap'd numeric table reader for the dataset layer.
//
// Native replacement for the host-side IO the reference delegates to
// pandas (utils/dataset.py read paths): parses whitespace/char-delimited
// float tables with a parallel two-pass strategy (pass 1: count rows/cols;
// pass 2: parse rows across a thread pool). Exposed to Python via ctypes
// (ggp_tpu/runtime/fast_csv.py).
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
//            fast_table.cc -o libggp_fast_table.so

#include <cctype>
#include <cerrno>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Mapped {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;
  bool ok() const { return data != nullptr; }
};

Mapped map_file(const char* path) {
  Mapped m;
  m.fd = ::open(path, O_RDONLY);
  if (m.fd < 0) return m;
  struct stat st;
  if (fstat(m.fd, &st) != 0 || st.st_size == 0) {
    ::close(m.fd);
    m.fd = -1;
    return m;
  }
  void* p = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, m.fd, 0);
  if (p == MAP_FAILED) {
    ::close(m.fd);
    m.fd = -1;
    return m;
  }
  m.data = static_cast<const char*>(p);
  m.size = static_cast<size_t>(st.st_size);
  return m;
}

void unmap(Mapped& m) {
  if (m.data) ::munmap(const_cast<char*>(m.data), m.size);
  if (m.fd >= 0) ::close(m.fd);
}

inline bool is_sep(char c, char delim) {
  if (delim == ' ')  // whitespace mode: any run of spaces/tabs
    return c == ' ' || c == '\t';
  return c == delim;
}

// Parse one line's fields into out (appending); returns field count.
// Whitespace mode collapses separator runs (pandas \s+ semantics);
// char-delimiter mode preserves EMPTY fields as NaN (pandas missing-value
// semantics) so columns stay aligned for rows like "1;;3".
long parse_line(const char* p, const char* end, char delim,
                std::vector<double>* out) {
  long n = 0;
  const char* q = p;
  if (delim == ' ') {
    while (q < end) {
      while (q < end && is_sep(*q, delim)) ++q;
      if (q >= end) break;
      char* after = nullptr;
      double v = strtod(q, &after);
      if (after == q || after > end) {  // non-numeric token: NaN, skip it
        v = NAN;
        while (q < end && !is_sep(*q, delim)) ++q;
        after = const_cast<char*>(q);
      }
      if (out) out->push_back(v);
      ++n;
      q = after;
    }
    return n;
  }
  // char-delimited: exactly one field between consecutive delimiters
  while (true) {
    const char* field_end = q;
    while (field_end < end && *field_end != delim) ++field_end;
    char* after = nullptr;
    double v = NAN;
    if (field_end > q) {
      v = strtod(q, &after);
      if (after == q || after > field_end) v = NAN;
    }
    if (out) out->push_back(v);
    ++n;
    if (field_end >= end) break;
    q = field_end + 1;
  }
  return n;
}

}  // namespace

extern "C" {

// Returns 0 on success. Caller frees *out_data with ggp_table_free.
int ggp_read_table(const char* path, char delim, long skiprows,
                   double** out_data, long* out_rows, long* out_cols) {
  Mapped m = map_file(path);
  if (!m.ok()) return -1;

  // split into lines (indices into the mapping), skipping blanks.
  // If the file does not end in a newline, the final line is copied into a
  // NUL-terminated side buffer — strtod on the mmap'd tail could otherwise
  // scan past the mapping (SIGSEGV on exact-page-multiple files).
  std::string tail_copy;
  std::vector<std::pair<const char*, const char*>> lines;
  lines.reserve(1 << 16);
  const char* p = m.data;
  const char* end = m.data + m.size;
  if (m.size > 0 && m.data[m.size - 1] != '\n') {
    const char* last_nl =
        static_cast<const char*>(memrchr(m.data, '\n', m.size));
    const char* tail = last_nl ? last_nl + 1 : m.data;
    tail_copy.assign(tail, end - tail);
    end = tail;  // the copied tail is appended after the loop
  }
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    const char* le = nl ? nl : end;
    const char* trim_end = le;
    if (trim_end > p && trim_end[-1] == '\r') --trim_end;
    bool blank = true;
    for (const char* c = p; c < trim_end; ++c)
      if (!isspace(static_cast<unsigned char>(*c))) { blank = false; break; }
    if (!blank) lines.emplace_back(p, trim_end);
    p = nl ? nl + 1 : end;
  }
  if (!tail_copy.empty()) {
    bool blank = true;
    for (char c : tail_copy)
      if (!isspace(static_cast<unsigned char>(c))) { blank = false; break; }
    if (!blank)
      lines.emplace_back(tail_copy.data(),
                         tail_copy.data() + tail_copy.size());
  }
  if (static_cast<long>(lines.size()) <= skiprows) {
    unmap(m);
    return -2;
  }
  lines.erase(lines.begin(), lines.begin() + skiprows);

  long ncols = parse_line(lines[0].first, lines[0].second, delim, nullptr);
  if (ncols <= 0) {
    unmap(m);
    return -3;
  }
  const long nrows = static_cast<long>(lines.size());
  double* data = static_cast<double*>(malloc(sizeof(double) * nrows * ncols));
  if (!data) {
    unmap(m);
    return -4;
  }

  unsigned hw = std::thread::hardware_concurrency();
  long nthreads = hw ? (hw > 16 ? 16 : hw) : 4;
  if (nrows < 4096) nthreads = 1;
  std::vector<std::thread> workers;
  std::vector<int> errs(nthreads, 0);
  const long chunk = (nrows + nthreads - 1) / nthreads;
  for (long t = 0; t < nthreads; ++t) {
    workers.emplace_back([&, t]() {
      std::vector<double> row;
      row.reserve(ncols);
      const long lo = t * chunk;
      const long hi = std::min(nrows, lo + chunk);
      for (long i = lo; i < hi; ++i) {
        row.clear();
        long got = parse_line(lines[i].first, lines[i].second, delim, &row);
        if (got != ncols) {
          // ragged row: pad with NaN / truncate (matches pandas' coercion
          // behaviour closely enough for UCI tables)
          row.resize(ncols, NAN);
        }
        memcpy(data + i * ncols, row.data(), sizeof(double) * ncols);
      }
    });
  }
  for (auto& w : workers) w.join();
  unmap(m);

  *out_data = data;
  *out_rows = nrows;
  *out_cols = ncols;
  return 0;
}

void ggp_table_free(double* p) { free(p); }

}  // extern "C"
