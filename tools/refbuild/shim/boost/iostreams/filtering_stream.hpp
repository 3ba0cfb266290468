// Minimal boost::iostreams shim over zlib (build-only, for A/B harness).
// Covers: filtering_ostream + gzip_compressor -> file_sink/back_inserter(string),
// filtering_streambuf<input> + gzip_decompressor -> std::istream& source.
#ifndef BOOST_IOSTREAMS_SHIM_HPP
#define BOOST_IOSTREAMS_SHIM_HPP
#include <zlib.h>

#include <cstdio>
#include <cstring>
#include <istream>
#include <memory>
#include <ostream>
#include <stdexcept>
#include <streambuf>
#include <string>

namespace boost {
namespace iostreams {

struct input {};
struct output {};

struct gzip_params {
  int level;
  explicit gzip_params(int l = 6) : level(l) {}
};
struct gzip_compressor {
  int level;
  explicit gzip_compressor(gzip_params p = gzip_params()) : level(p.level) {}
};
struct gzip_decompressor {};

struct file_sink {
  std::string path;
  std::ios_base::openmode mode;
  explicit file_sink(const std::string &p,
                     std::ios_base::openmode m = std::ios_base::out)
      : path(p), mode(m) {}
};
struct file_source {
  std::string path;
  std::ios_base::openmode mode;
  explicit file_source(const std::string &p,
                       std::ios_base::openmode m = std::ios_base::in)
      : path(p), mode(m) {}
};
struct string_backinsert {
  std::string *s;
};
inline string_backinsert back_inserter(std::string &s) { return {&s}; }

// ------------------------- output side -------------------------

class gzip_ostreambuf : public std::streambuf {
 public:
  gzip_ostreambuf() = default;
  ~gzip_ostreambuf() override { close(); }

  void open_file(const std::string &path, int level) {
    fp_ = std::fopen(path.c_str(), "wb");
    if (!fp_) throw std::runtime_error("cannot open " + path);
    init(level);
  }
  void open_string(std::string *s, int level) {
    str_ = s;
    init(level);
  }

  void close() {
    if (!open_) return;
    deflate_all(Z_FINISH);
    deflateEnd(&zs_);
    if (fp_) {
      std::fclose(fp_);
      fp_ = nullptr;
    }
    str_ = nullptr;
    open_ = false;
  }

 protected:
  int overflow(int ch) override {
    if (pptr() > pbase()) deflate_all(Z_NO_FLUSH);
    if (ch != traits_type::eof()) {
      inbuf_[0] = static_cast<char>(ch);
      setp(inbuf_, inbuf_ + sizeof(inbuf_));
      pbump(1);
    }
    return 0;
  }
  int sync() override {
    if (pptr() > pbase()) deflate_all(Z_NO_FLUSH);
    return 0;
  }

 private:
  void init(int level) {
    std::memset(&zs_, 0, sizeof(zs_));
    // 15+16 => gzip framing
    if (deflateInit2(&zs_, level, Z_DEFLATED, 15 + 16, 8,
                     Z_DEFAULT_STRATEGY) != Z_OK)
      throw std::runtime_error("deflateInit2 failed");
    open_ = true;
    setp(inbuf_, inbuf_ + sizeof(inbuf_));
  }
  void deflate_all(int flush) {
    zs_.next_in = reinterpret_cast<Bytef *>(pbase());
    zs_.avail_in = static_cast<uInt>(pptr() - pbase());
    do {
      zs_.next_out = reinterpret_cast<Bytef *>(outbuf_);
      zs_.avail_out = sizeof(outbuf_);
      int rc = deflate(&zs_, flush);
      if (rc == Z_STREAM_ERROR) throw std::runtime_error("deflate failed");
      size_t produced = sizeof(outbuf_) - zs_.avail_out;
      if (produced) {
        if (fp_) {
          if (std::fwrite(outbuf_, 1, produced, fp_) != produced)
            throw std::runtime_error("gzip write failed");
        } else if (str_) {
          str_->append(outbuf_, produced);
        }
      }
      if (flush == Z_FINISH && rc == Z_STREAM_END) break;
    } while (zs_.avail_in > 0 || zs_.avail_out == 0 ||
             (flush == Z_FINISH));
    setp(inbuf_, inbuf_ + sizeof(inbuf_));
  }

  z_stream zs_{};
  bool open_ = false;
  FILE *fp_ = nullptr;
  std::string *str_ = nullptr;
  char inbuf_[1 << 16];
  char outbuf_[1 << 16];
};

class filtering_ostream : public std::ostream {
 public:
  filtering_ostream() : std::ostream(nullptr), buf_(new gzip_ostreambuf()) {
    rdbuf(buf_.get());
  }
  ~filtering_ostream() override { buf_->close(); }
  void push(const gzip_compressor &c) { level_ = c.level; }
  void push(const file_sink &s) { buf_->open_file(s.path, level_); }
  void push(const string_backinsert &b) { buf_->open_string(b.s, level_); }
  void close_impl() {
    flush();
    buf_->close();
  }
  void pop() { close_impl(); }

 private:
  std::unique_ptr<gzip_ostreambuf> buf_;
  int level_ = 6;
};

inline void close(filtering_ostream &os) { os.close_impl(); }

// ------------------------- input side -------------------------

template <typename Mode>
class filtering_streambuf;

template <>
class filtering_streambuf<input> : public std::streambuf {
 public:
  filtering_streambuf() = default;
  ~filtering_streambuf() override {
    if (open_) inflateEnd(&zs_);
  }
  void push(const gzip_decompressor &) {}
  void push(std::istream &src) {
    src_ = src.rdbuf();
    std::memset(&zs_, 0, sizeof(zs_));
    if (inflateInit2(&zs_, 15 + 16) != Z_OK)
      throw std::runtime_error("inflateInit2 failed");
    open_ = true;
    setg(outbuf_, outbuf_, outbuf_);
  }

 protected:
  int underflow() override {
    if (gptr() < egptr()) return traits_type::to_int_type(*gptr());
    if (!open_ || eof_) return traits_type::eof();
    size_t produced = 0;
    while (produced == 0) {
      if (zs_.avail_in == 0) {
        std::streamsize got = src_->sgetn(inbuf_, sizeof(inbuf_));
        if (got <= 0 && zs_.avail_in == 0) {
          eof_ = true;
          return traits_type::eof();
        }
        zs_.next_in = reinterpret_cast<Bytef *>(inbuf_);
        zs_.avail_in = static_cast<uInt>(got);
      }
      zs_.next_out = reinterpret_cast<Bytef *>(outbuf_);
      zs_.avail_out = sizeof(outbuf_);
      int rc = inflate(&zs_, Z_NO_FLUSH);
      produced = sizeof(outbuf_) - zs_.avail_out;
      if (rc == Z_STREAM_END) {
        // support concatenated gzip members
        if (zs_.avail_in > 0 || src_->sgetc() != traits_type::eof()) {
          Bytef *rem_in = zs_.next_in;
          uInt rem_avail = zs_.avail_in;
          inflateReset2(&zs_, 15 + 16);
          zs_.next_in = rem_in;
          zs_.avail_in = rem_avail;
        } else if (produced == 0) {
          eof_ = true;
          return traits_type::eof();
        } else {
          eof_pending_ = true;
        }
      } else if (rc != Z_OK && rc != Z_BUF_ERROR) {
        throw std::runtime_error("inflate failed");
      }
      if (eof_pending_) break;
    }
    if (eof_pending_) eof_ = true;
    setg(outbuf_, outbuf_, outbuf_ + produced);
    if (produced == 0) return traits_type::eof();
    return traits_type::to_int_type(*gptr());
  }

 private:
  std::streambuf *src_ = nullptr;
  z_stream zs_{};
  bool open_ = false;
  bool eof_ = false;
  bool eof_pending_ = false;
  char inbuf_[1 << 16];
  char outbuf_[1 << 16];
};

}  // namespace iostreams
}  // namespace boost
#endif
