// Minimal boost::filesystem shim over std::filesystem (build-only, for A/B harness).
#ifndef BOOST_FS_SHIM_HPP
#define BOOST_FS_SHIM_HPP
#include <filesystem>
namespace boost {
namespace filesystem {
using std::filesystem::path;
using std::filesystem::directory_iterator;
using std::filesystem::exists;
using std::filesystem::file_size;
inline bool create_directory(const std::string &p) {
  std::error_code ec;
  bool ok = std::filesystem::create_directory(p, ec);
  return ok && !ec;
}
inline std::uintmax_t remove_all(const std::string &p) {
  std::error_code ec;
  return std::filesystem::remove_all(p, ec);
}
}  // namespace filesystem
}  // namespace boost
#endif
