// yt8m_io — native TFRecord + tf.Example/SequenceExample batch parser.
//
// TPU-native equivalent of the reference's input path (readers.py delegated
// to TF's C++ RecordReader + parse ops; SURVEY.md §2.3). Exposed as a C API
// consumed via ctypes from yt8m_tpu/data/pipeline.py.
//
// Wire formats handled:
//   TFRecord framing: u64 length | u32 masked-crc(length) | data | u32 crc.
//   tf.Example          { Features features = 1; }
//   tf.SequenceExample  { Features context = 1; FeatureLists lists = 2; }
//   Features  { map<string, Feature> = 1 }   Feature { bytes_list=1 |
//   float_list=2 | int64_list=3 }            *List { repeated value = 1 }
//
// Parsing is zero-copy until the final memcpy into the caller's batch
// buffers; CRC checks are skipped on the hot path (TF's readers do the
// same by default for local files).
//
// Build: g++ -O3 -shared -fPIC -o libyt8m_io.so yt8m_io.cc

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Slice {
  const uint8_t* data = nullptr;
  size_t len = 0;
};

// --- varint / wire helpers -------------------------------------------------

inline bool read_varint(const uint8_t*& p, const uint8_t* end, uint64_t* out) {
  uint64_t result = 0;
  int shift = 0;
  while (p < end && shift <= 63) {
    uint8_t b = *p++;
    result |= static_cast<uint64_t>(b & 0x7F) << shift;
    if (!(b & 0x80)) {
      *out = result;
      return true;
    }
    shift += 7;
  }
  return false;
}

// Iterate protobuf fields of a message slice. Calls fn(field, wire, payload)
// where payload is a Slice for wire==2 and the varint value packed in len
// otherwise.
template <typename Fn>
bool for_each_field(Slice msg, Fn&& fn) {
  const uint8_t* p = msg.data;
  const uint8_t* end = msg.data + msg.len;
  while (p < end) {
    uint64_t key;
    if (!read_varint(p, end, &key)) return false;
    uint32_t field = static_cast<uint32_t>(key >> 3);
    uint32_t wire = static_cast<uint32_t>(key & 7);
    if (wire == 0) {
      uint64_t v;
      if (!read_varint(p, end, &v)) return false;
      fn(field, wire, Slice{nullptr, static_cast<size_t>(v)});
    } else if (wire == 1) {
      if (p + 8 > end) return false;
      fn(field, wire, Slice{p, 8});
      p += 8;
    } else if (wire == 2) {
      uint64_t len;
      if (!read_varint(p, end, &len)) return false;
      // subtraction form: p + len wraps for a crafted 64-bit length
      if (len > static_cast<uint64_t>(end - p)) return false;
      fn(field, wire, Slice{p, static_cast<size_t>(len)});
      p += len;
    } else if (wire == 5) {
      if (p + 4 > end) return false;
      fn(field, wire, Slice{p, 4});
      p += 4;
    } else {
      return false;
    }
  }
  return true;
}

// Find first bytes value inside a BytesList Feature payload.
Slice first_bytes_of_feature(Slice feature) {
  Slice out;
  for_each_field(feature, [&](uint32_t f, uint32_t w, Slice v) {
    if (f == 1 && w == 2 && out.data == nullptr) {  // BytesList
      for_each_field(v, [&](uint32_t f2, uint32_t w2, Slice v2) {
        if (f2 == 1 && w2 == 2 && out.data == nullptr) out = v2;
      });
    }
  });
  return out;
}

void int64s_of_feature(Slice feature, std::vector<int64_t>* out) {
  for_each_field(feature, [&](uint32_t f, uint32_t w, Slice v) {
    if (f == 3 && w == 2) {  // Int64List
      for_each_field(v, [&](uint32_t f2, uint32_t w2, Slice v2) {
        if (f2 != 1) return;
        if (w2 == 2) {  // packed
          const uint8_t* p = v2.data;
          const uint8_t* end = v2.data + v2.len;
          uint64_t x;
          while (p < end && read_varint(p, end, &x))
            out->push_back(static_cast<int64_t>(x));
        } else if (w2 == 0) {
          out->push_back(static_cast<int64_t>(v2.len));
        }
      });
    }
  });
}

void floats_of_feature(Slice feature, std::vector<float>* out) {
  for_each_field(feature, [&](uint32_t f, uint32_t w, Slice v) {
    if (f == 2 && w == 2) {  // FloatList
      for_each_field(v, [&](uint32_t f2, uint32_t w2, Slice v2) {
        if (f2 != 1) return;
        if (w2 == 2) {  // packed
          size_t n = v2.len / 4;
          size_t base = out->size();
          out->resize(base + n);
          memcpy(out->data() + base, v2.data, n * 4);
        } else if (w2 == 5) {
          float x;
          memcpy(&x, v2.data, 4);
          out->push_back(x);
        }
      });
    }
  });
}


// --- crc32c (Castagnoli) -----------------------------------------------------
// TFRecord framing carries masked crc32c of the length field and of the
// data; the reference's RecordReader validates them. Hardware path via
// SSE4.2 (this file builds with -march=native), table fallback otherwise.

#if defined(__SSE4_2__)
inline uint32_t crc32c(const uint8_t* p, size_t n) {
  uint64_t c = 0xFFFFFFFFu;
  while (n >= 8) {
    uint64_t v;
    memcpy(&v, p, 8);
    c = __builtin_ia32_crc32di(c, v);
    p += 8;
    n -= 8;
  }
  uint32_t c32 = static_cast<uint32_t>(c);
  while (n--) c32 = __builtin_ia32_crc32qi(c32, *p++);
  return c32 ^ 0xFFFFFFFFu;
}
#else
struct Crc32cTable {
  uint32_t t[256];
  Crc32cTable() {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t c = i;
      for (int k = 0; k < 8; ++k)
        c = (c & 1) ? (0x82F63B78u ^ (c >> 1)) : (c >> 1);
      t[i] = c;
    }
  }
};

inline uint32_t crc32c(const uint8_t* p, size_t n) {
  // C++11 magic static: guaranteed thread-safe one-time init (the old
  // plain-bool lazy init could publish init==true before the table
  // stores on weakly-ordered targets; ThreadedBatchIterator calls this
  // concurrently).
  static const Crc32cTable table;
  uint32_t c = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; ++i)
    c = table.t[(c ^ p[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}
#endif

inline uint32_t masked_crc32c(const uint8_t* p, size_t n) {
  uint32_t crc = crc32c(p, n);
  return ((crc >> 15) | (crc << 17)) + 0xa282ead8u;
}

// --- reader ------------------------------------------------------------------

struct Reader {
  std::vector<std::string> feature_names;
  std::vector<int> feature_sizes;   // per-frame bytes (frame level) or float
                                    // count (video level)
  int max_frames = 300;
  bool frame_level = true;
  std::string distill_name;         // optional float context feature
  int distill_dim = 0;

  std::vector<std::string> paths;
  size_t path_idx = 0;
  // 0 = no CRC checks, 1 = length-field CRC (near-free, catches framing
  // corruption), 2 = length + full data CRC (one extra pass over the
  // bytes; reference RecordReader semantics). Default 1.
  int validate_crc = 1;

  // Labels that did not fit the caller's flat label budget (labels_cap).
  // The parser never caps per video — ground truth is written verbatim,
  // matching the reference reader — so this only grows when a batch's
  // TOTAL label count exceeds labels_cap. Queryable via
  // yt8m_reader_labels_dropped so the Python pipeline can warn instead
  // of silently diverging.
  long long labels_dropped = 0;

  // mmap-backed shard: records become zero-copy slices into the file
  // mapping (no per-record fread copy — the parser's single biggest
  // memory-bandwidth cost at ~345 KB/video).
  const uint8_t* map_base = nullptr;
  size_t map_len = 0;
  size_t map_pos = 0;

  void unmap() {
    if (map_base) {
      munmap(const_cast<uint8_t*>(map_base), map_len);
      map_base = nullptr;
      map_len = 0;
      map_pos = 0;
    }
  }

  ~Reader() { unmap(); }

  bool open_next_file() {
    unmap();
    while (path_idx < paths.size()) {
      const char* path = paths[path_idx++].c_str();
      int fd = open(path, O_RDONLY);
      if (fd < 0) continue;
      struct stat st;
      if (fstat(fd, &st) != 0 || st.st_size == 0) {
        close(fd);
        continue;
      }
      void* m = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
      close(fd);  // mapping keeps the file alive
      if (m == MAP_FAILED) continue;
      madvise(m, st.st_size, MADV_SEQUENTIAL);
      map_base = static_cast<const uint8_t*>(m);
      map_len = static_cast<size_t>(st.st_size);
      map_pos = 0;
      return true;
    }
    return false;
  }

  bool next_record(Slice* rec) {
    for (;;) {
      if (!map_base && !open_next_file()) return false;
      // TFRecord framing: u64 len | u32 crc(len) | data | u32 crc(data)
      if (map_pos + 12 > map_len) {
        unmap();
        continue;
      }
      uint64_t len;
      memcpy(&len, map_base + map_pos, 8);  // LE hosts (x86/ARM LE)
      // Subtraction-form bounds check: the additive form
      // (map_pos + 12 + len + 4 > map_len) wraps for a crafted
      // len near 2^64 and would pass, sending a ~2^64-byte Slice to
      // the parser/CRC. rem >= 0 because map_pos + 12 <= map_len here.
      size_t rem = map_len - map_pos - 12;
      if (rem < 4 || len > rem - 4) {
        unmap();  // truncated/corrupt length: drop the partial record
        continue;
      }
      if (validate_crc >= 1) {
        uint32_t stored;
        memcpy(&stored, map_base + map_pos + 8, 4);
        if (masked_crc32c(map_base + map_pos, 8) != stored) {
          // Corrupt framing: resync is impossible (record boundaries
          // derive from the length), so drop the rest of the shard —
          // same policy as truncation.
          fprintf(stderr,
                  "yt8m_io: length-crc mismatch at offset %zu; "
                  "dropping rest of shard\n", map_pos);
          unmap();
          continue;
        }
      }
      if (validate_crc >= 2) {
        uint32_t stored;
        memcpy(&stored, map_base + map_pos + 12 + len, 4);
        if (masked_crc32c(map_base + map_pos + 12, len) != stored) {
          // Payload corruption with VALID framing: the record boundary
          // is trustworthy (length crc passed), so skip just this
          // record instead of silently losing the rest of the shard
          // (the reference surfaces DataLossError; we diagnose + skip).
          fprintf(stderr,
                  "yt8m_io: data-crc mismatch at offset %zu "
                  "(len %llu); skipping record\n", map_pos,
                  (unsigned long long)len);
          map_pos += 12 + len + 4;
          continue;
        }
      }
      rec->data = map_base + map_pos + 12;
      rec->len = static_cast<size_t>(len);
      map_pos += 12 + len + 4;
      return true;
    }
  }
};

// Extract named features from a Features message into parallel slices.
struct ContextOut {
  Slice id;
  std::vector<int64_t> labels;
  std::vector<float> distill;
};

void parse_features_map(Slice features_msg, const std::string& distill_name,
                        ContextOut* out,
                        const std::vector<std::string>* names = nullptr,
                        std::vector<std::vector<float>>* floats = nullptr) {
  for_each_field(features_msg, [&](uint32_t f, uint32_t w, Slice entry) {
    if (f != 1 || w != 2) return;
    Slice key, feat;
    for_each_field(entry, [&](uint32_t f2, uint32_t w2, Slice v) {
      if (f2 == 1 && w2 == 2) key = v;
      if (f2 == 2 && w2 == 2) feat = v;
    });
    if (!key.data) return;
    std::string k(reinterpret_cast<const char*>(key.data), key.len);
    if (k == "id" || k == "video_id") {
      out->id = first_bytes_of_feature(feat);
    } else if (k == "labels") {
      int64s_of_feature(feat, &out->labels);
    } else if (!distill_name.empty() && k == distill_name) {
      floats_of_feature(feat, &out->distill);
    } else if (names && floats) {
      for (size_t i = 0; i < names->size(); ++i) {
        if (k == (*names)[i]) {
          floats_of_feature(feat, &(*floats)[i]);
          break;
        }
      }
    }
  });
}

}  // namespace

extern "C" {

// Masked CRC32-C for TFRecord framing, exposed for the Python WRITER
// (the fixture generator was spending ~70% of its time in the pure-
// Python table loop; this reuses the reader's SSE4.2/table fast path).
uint32_t yt8m_masked_crc32c(const uint8_t* p, size_t n) {
  uint32_t c = crc32c(p, n);
  return static_cast<uint32_t>(((c >> 15) | (c << 17)) + 0xA282EAD8u);
}

void yt8m_reader_set_validate(Reader* r, int level) {
  r->validate_crc = level;
}

long long yt8m_reader_labels_dropped(Reader* r) {
  return r->labels_dropped;
}

Reader* yt8m_reader_new(const char* const* feature_names,
                        const int* feature_sizes, int num_features,
                        int max_frames, int frame_level,
                        const char* distill_name, int distill_dim) {
  Reader* r = new Reader();
  for (int i = 0; i < num_features; ++i) {
    r->feature_names.emplace_back(feature_names[i]);
    r->feature_sizes.push_back(feature_sizes[i]);
  }
  r->max_frames = max_frames;
  r->frame_level = frame_level != 0;
  if (distill_name && distill_name[0]) {
    r->distill_name = distill_name;
    r->distill_dim = distill_dim;
  }
  return r;
}

void yt8m_reader_add_file(Reader* r, const char* path) {
  r->paths.emplace_back(path);
}

void yt8m_reader_free(Reader* r) { delete r; }

// Frame-level batch. Buffers (caller-allocated):
//   features   u8 [batch, max_frames, sum(sizes)]  (MUST arrive zeroed)
//   num_frames i32 [batch]
//   label_off  i32 [batch + 1]
//   labels     i32 [labels_cap]
//   ids        char [batch * id_stride]
//   distill    f32 [batch * distill_dim] (may be null; MUST arrive zeroed)
// Returns number of videos written (0 = end of data), or -1 on error.
//
// CONTRACT: `features` must be ZERO-INITIALIZED by the caller (e.g.
// np.zeros — a fresh calloc'd buffer is kernel zero pages, so the
// guarantee is free). The parser writes ONLY the real frame rows;
// padding tails are never touched. Zeroing tails here was measured at
// ~48 us/video (as much as the data copy itself) and, worse, forces
// write faults on pages that would otherwise stay untouched virtual
// zero pages — removing it took the harness from 7.6k to 12.9k
// videos/s/core (see BENCH_NOTES).
int yt8m_reader_next_frame_batch(Reader* r, int batch, uint8_t* features,
                                 int32_t* num_frames, int32_t* label_off,
                                 int32_t* labels, int labels_cap, char* ids,
                                 int id_stride, float* distill) {
  if (!r->frame_level) return -1;
  int total_dim = 0;
  for (int s : r->feature_sizes) total_dim += s;
  const size_t video_bytes =
      static_cast<size_t>(r->max_frames) * total_dim;

  int n = 0;
  int label_cursor = 0;
  // NO per-video label cap: ground truth is written verbatim (reference
  // reader semantics — a sparse-to-dense scatter of ALL labels). The
  // only bound is the caller's flat labels_cap budget; overflow is
  // counted in r->labels_dropped and surfaced as a Python warning
  // rather than silently truncating training/eval targets.
  label_off[0] = 0;
  Slice rec;
  while (n < batch && r->next_record(&rec)) {
    Slice context, lists;
    for_each_field(rec, [&](uint32_t f, uint32_t w, Slice v) {
      if (f == 1 && w == 2) context = v;
      if (f == 2 && w == 2) lists = v;
    });

    ContextOut ctx;
    if (context.data) parse_features_map(context, r->distill_name, &ctx);

    // feature_lists: copy each named list's per-frame bytes.
    uint8_t* vid_base = features + static_cast<size_t>(n) * video_bytes;
    int nf = -1;
    if (lists.data) {
      for_each_field(lists, [&](uint32_t f, uint32_t w, Slice entry) {
        if (f != 1 || w != 2) return;
        Slice key, flist;
        for_each_field(entry, [&](uint32_t f2, uint32_t w2, Slice v) {
          if (f2 == 1 && w2 == 2) key = v;
          if (f2 == 2 && w2 == 2) flist = v;
        });
        if (!key.data || !flist.data) return;
        std::string k(reinterpret_cast<const char*>(key.data), key.len);
        int col = 0;
        int size = 0;
        bool found = false;
        for (size_t i = 0; i < r->feature_names.size(); ++i) {
          if (k == r->feature_names[i]) {
            size = r->feature_sizes[i];
            found = true;
            break;
          }
          col += r->feature_sizes[i];
        }
        if (!found) return;
        int t = 0;
        for_each_field(flist, [&](uint32_t f3, uint32_t w3, Slice feat) {
          if (f3 != 1 || w3 != 2) return;
          if (t >= r->max_frames) {
            ++t;
            return;
          }
          uint8_t* dst =
              vid_base + static_cast<size_t>(t) * total_dim + col;
          Slice bytes = first_bytes_of_feature(feat);
          if (bytes.data && static_cast<int>(bytes.len) == size) {
            memcpy(dst, bytes.data, size);
          } else {
            memset(dst, 0, size);  // malformed frame: keep zeros
          }
          ++t;
        });
        if (t > nf) nf = t;
      });
    }
    num_frames[n] = nf < 0 ? 0
                    : (nf > r->max_frames ? r->max_frames : nf);

    // labels (verbatim; flat-budget overflow counted, see labels_dropped)
    for (int64_t c : ctx.labels) {
      if (label_cursor < labels_cap)
        labels[label_cursor++] = static_cast<int32_t>(c);
      else
        ++r->labels_dropped;
    }
    label_off[n + 1] = label_cursor;

    // id
    char* id_dst = ids + static_cast<size_t>(n) * id_stride;
    size_t id_len = ctx.id.len < static_cast<size_t>(id_stride - 1)
                        ? ctx.id.len
                        : static_cast<size_t>(id_stride - 1);
    memset(id_dst, 0, id_stride);
    if (ctx.id.data) memcpy(id_dst, ctx.id.data, id_len);

    if (distill && r->distill_dim && !ctx.distill.empty()) {
      size_t m = ctx.distill.size() < static_cast<size_t>(r->distill_dim)
                     ? ctx.distill.size()
                     : static_cast<size_t>(r->distill_dim);
      memcpy(distill + static_cast<size_t>(n) * r->distill_dim,
             ctx.distill.data(), m * sizeof(float));
    }
    ++n;
  }
  return n;
}

// Video-level batch: features f32 [batch, sum(sizes)].
int yt8m_reader_next_video_batch(Reader* r, int batch, float* features,
                                 int32_t* label_off, int32_t* labels,
                                 int labels_cap, char* ids, int id_stride,
                                 float* distill) {
  if (r->frame_level) return -1;
  int total_dim = 0;
  for (int s : r->feature_sizes) total_dim += s;
  memset(features, 0, sizeof(float) * batch * total_dim);
  if (distill && r->distill_dim)
    memset(distill, 0, sizeof(float) * batch * r->distill_dim);

  int n = 0;
  int label_cursor = 0;
  // No per-video cap — same contract as the frame-level batch.
  label_off[0] = 0;
  Slice rec;
  std::vector<std::vector<float>> floats(r->feature_names.size());
  while (n < batch && r->next_record(&rec)) {
    Slice feats_msg;
    for_each_field(rec, [&](uint32_t f, uint32_t w, Slice v) {
      if (f == 1 && w == 2) feats_msg = v;
    });
    ContextOut ctx;
    for (auto& v : floats) v.clear();
    if (feats_msg.data)
      parse_features_map(feats_msg, r->distill_name, &ctx,
                         &r->feature_names, &floats);

    float* row = features + static_cast<size_t>(n) * total_dim;
    int col = 0;
    for (size_t i = 0; i < floats.size(); ++i) {
      int want = r->feature_sizes[i];
      int have = static_cast<int>(floats[i].size());
      int m = have < want ? have : want;
      if (m > 0) memcpy(row + col, floats[i].data(), m * sizeof(float));
      col += want;
    }

    for (int64_t c : ctx.labels) {
      if (label_cursor < labels_cap)
        labels[label_cursor++] = static_cast<int32_t>(c);
      else
        ++r->labels_dropped;
    }
    label_off[n + 1] = label_cursor;

    char* id_dst = ids + static_cast<size_t>(n) * id_stride;
    size_t id_len = ctx.id.len < static_cast<size_t>(id_stride - 1)
                        ? ctx.id.len
                        : static_cast<size_t>(id_stride - 1);
    memset(id_dst, 0, id_stride);
    if (ctx.id.data) memcpy(id_dst, ctx.id.data, id_len);

    if (distill && r->distill_dim && !ctx.distill.empty()) {
      size_t m = ctx.distill.size() < static_cast<size_t>(r->distill_dim)
                     ? ctx.distill.size()
                     : static_cast<size_t>(r->distill_dim);
      memcpy(distill + static_cast<size_t>(n) * r->distill_dim,
             ctx.distill.data(), m * sizeof(float));
    }
    ++n;
  }
  return n;
}

// ---- Kaggle CSV formatting (reference: inference.py :: format_lines) ----
// ids: n fixed-stride byte rows (NUL-padded, the reader's id layout);
// values [n,k] f32, indices [n,k] i32. Emits one line per row —
// "id,cls p cls p ...\n" with "%i %g" pairs ordered by descending value
// (stable, matching np.argsort(-v, kind="stable")). Returns bytes
// written, or -1 if out_cap could be exceeded. Python's "%g" is C's
// "%g", so output is byte-identical to the Python formatter.
int64_t yt8m_format_topk(const char* ids, int id_stride,
                         const float* values, const int32_t* indices,
                         int n, int k, char* out, int64_t out_cap) {
  std::vector<int> order(k);
  char* p = out;
  char* end = out + out_cap;
  for (int i = 0; i < n; ++i) {
    const float* v = values + static_cast<size_t>(i) * k;
    const int32_t* ix = indices + static_cast<size_t>(i) * k;
    for (int j = 0; j < k; ++j) order[j] = j;
    std::stable_sort(order.begin(), order.end(),
                     [&](int a, int b) { return v[a] > v[b]; });
    const char* id = ids + static_cast<size_t>(i) * id_stride;
    size_t id_len = strnlen(id, id_stride);
    // worst case per pair: " " + 11-digit int + " " + "%g" (<= 13 chars)
    if (p + id_len + 2 + static_cast<size_t>(k) * 32 > end) return -1;
    memcpy(p, id, id_len);
    p += id_len;
    *p++ = ',';
    for (int j = 0; j < k; ++j) {
      if (j) *p++ = ' ';
      p += snprintf(p, 32, "%i %g", static_cast<int>(ix[order[j]]),
                    static_cast<double>(v[order[j]]));
    }
    *p++ = '\n';
  }
  return p - out;
}

}  // extern "C"
