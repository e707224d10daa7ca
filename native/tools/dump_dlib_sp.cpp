// Standalone converter: dlib shape_predictor .dat -> reface .rert binary.
//
// Implements dlib's on-disk serialization encoding directly (documented in
// the public dlib sources, dlib/serialize.h) so NO dlib dependency is
// needed — this compiles anywhere with a C++17 compiler:
//
//   integer  control byte = n_bytes | (0x80 if negative), bytes LSB-first
//   float    float_details: packed int64 mantissa, packed int16 exponent;
//            value = mantissa * 2^exponent
//   matrix   packed long nr, nc, then row-major floats
//   vector<float,2>  x, y
//   std::vector      packed size then elements
//   shape_predictor  int version(=1), matrix initial_shape,
//                    vector<vector<regression_tree>> forests
//                    (tree = vector<split{idx1,idx2,thresh}> +
//                     vector<matrix> leaves),
//                    vector<vector<unsigned>> anchor_idx,
//                    vector<vector<vector<float,2>>> deltas
//
// Output format: see native/src/reface_native.cpp (RERT header) and
// tools/convert_dlib_sp.py::write_model — both paths produce identical
// bytes (tested in tests/test_dlib_convert.py).
//
// Build: g++ -O2 -std=c++17 -o dump_dlib_sp native/tools/dump_dlib_sp.cpp
// Usage: dump_dlib_sp shape_predictor_68_face_landmarks.dat out.rert

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace {

class Reader {
 public:
  explicit Reader(std::ifstream& f) : f_(f) {}

  int64_t read_int() {
    int ctrl = f_.get();
    if (ctrl == EOF) throw std::runtime_error("unexpected EOF");
    bool neg = ctrl & 0x80;
    int size = ctrl & 0x7F;
    if (size > 8) throw std::runtime_error("bad int control byte");
    uint64_t val = 0;
    for (int i = 0; i < size; ++i) {
      int b = f_.get();
      if (b == EOF) throw std::runtime_error("truncated int");
      val |= (uint64_t)b << (8 * i);
    }
    return neg ? -(int64_t)val : (int64_t)val;
  }

  float read_float() {
    int64_t mantissa = read_int();
    int64_t exponent = read_int();
    return (float)std::ldexp((double)mantissa, (int)exponent);
  }

  std::vector<float> read_matrix(int64_t* nr_out = nullptr) {
    int64_t nr = read_int();
    int64_t nc = read_int();
    std::vector<float> out((size_t)(nr * nc));
    for (auto& v : out) v = read_float();
    if (nr_out) *nr_out = nr;
    return out;
  }

 private:
  std::ifstream& f_;
};

struct Split {
  int32_t f1, f2;
  float thr;
};
struct Tree {
  std::vector<Split> splits;
  std::vector<std::vector<float>> leaves;
};
struct Cascade {
  std::vector<int32_t> anchors;
  std::vector<float> deltas;  // (F, 2) flattened
  std::vector<Tree> trees;
};

}  // namespace

int main(int argc, char** argv) {
  if (argc != 3) {
    std::fprintf(stderr, "usage: %s in.dat out.rert\n", argv[0]);
    return 2;
  }
  std::ifstream in(argv[1], std::ios::binary);
  if (!in) {
    std::fprintf(stderr, "cannot open %s\n", argv[1]);
    return 1;
  }
  Reader r(in);
  try {
    int64_t version = r.read_int();
    if (version != 1) throw std::runtime_error("unsupported version");
    std::vector<float> init = r.read_matrix();
    int n_points = (int)init.size() / 2;

    int64_t n_casc = r.read_int();
    std::vector<Cascade> cascades((size_t)n_casc);
    for (auto& c : cascades) {
      int64_t n_trees = r.read_int();
      c.trees.resize((size_t)n_trees);
      for (auto& t : c.trees) {
        int64_t n_splits = r.read_int();
        t.splits.resize((size_t)n_splits);
        for (auto& s : t.splits) {
          s.f1 = (int32_t)r.read_int();
          s.f2 = (int32_t)r.read_int();
          s.thr = r.read_float();
        }
        int64_t n_leaves = r.read_int();
        t.leaves.resize((size_t)n_leaves);
        for (auto& l : t.leaves) l = r.read_matrix();
      }
    }
    if (r.read_int() != n_casc) throw std::runtime_error("anchor count");
    for (auto& c : cascades) {
      int64_t n = r.read_int();
      c.anchors.resize((size_t)n);
      for (auto& a : c.anchors) a = (int32_t)r.read_int();
    }
    if (r.read_int() != n_casc) throw std::runtime_error("delta count");
    for (auto& c : cascades) {
      int64_t n = r.read_int();
      c.deltas.resize((size_t)n * 2);
      for (int64_t i = 0; i < n; ++i) {
        c.deltas[(size_t)i * 2] = r.read_float();
        c.deltas[(size_t)i * 2 + 1] = r.read_float();
      }
    }

    // validate complete trees with one shared depth
    int n_splits = (int)cascades.at(0).trees.at(0).splits.size();
    int depth = 0;
    while ((1 << (depth + 1)) - 1 <= n_splits) ++depth;
    if ((1 << depth) - 1 != n_splits)
      throw std::runtime_error("tree is not complete");
    for (auto& c : cascades)
      for (auto& t : c.trees)
        if ((int)t.splits.size() != n_splits ||
            (int)t.leaves.size() != n_splits + 1)
          throw std::runtime_error("ragged tree");

    std::ofstream out(argv[2], std::ios::binary);
    if (!out) throw std::runtime_error("cannot write output");
    auto w32 = [&](int32_t v) { out.write((char*)&v, 4); };
    auto wf = [&](const float* p, size_t n) { out.write((char*)p, n * 4); };
    w32(0x52455254);
    w32(n_points);
    w32((int32_t)n_casc);
    w32((int32_t)cascades[0].trees.size());
    w32(depth);
    w32((int32_t)cascades[0].anchors.size());
    wf(init.data(), init.size());
    for (auto& c : cascades) {
      out.write((char*)c.anchors.data(), c.anchors.size() * 4);
      wf(c.deltas.data(), c.deltas.size());
      for (auto& t : c.trees) {
        for (auto& s : t.splits) {
          w32(s.f1);
          w32(s.f2);
          wf(&s.thr, 1);
        }
        for (auto& l : t.leaves) wf(l.data(), l.size());
      }
    }
    std::printf("wrote %s: %d points, %d cascades, %d trees, depth %d\n",
                argv[2], n_points, (int)n_casc,
                (int)cascades[0].trees.size(), depth);
  } catch (const std::exception& e) {
    std::fprintf(stderr, "error: %s\n", e.what());
    return 1;
  }
  return 0;
}
