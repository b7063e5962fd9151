#pragma once
// Minimal drop-in for boost::iostreams::mapped_file (readonly mode only),
// backed by POSIX mmap.  Boost is absent from this image; the reference
// build (tests/golden/build_reference.sh) injects this header via -I so the
// reference sources compile UNMODIFIED (/root/reference stays read-only).
// Surface limited to what the reference uses (src/fast.cpp:161,196,
// src/linear.cpp:339,350): ctor(path, readonly), const_data(), size().

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <stdexcept>
#include <string>

namespace boost {
namespace iostreams {

class mapped_file {
 public:
  enum mapmode { readonly };

  mapped_file(const std::string &path, mapmode) {
    int fd = ::open(path.c_str(), O_RDONLY);
    if (fd < 0) {
      throw std::runtime_error("mapped_file: cannot open " + path);
    }
    struct stat st;
    if (::fstat(fd, &st) != 0) {
      ::close(fd);
      throw std::runtime_error("mapped_file: fstat failed for " + path);
    }
    size_ = static_cast<size_t>(st.st_size);
    if (size_ > 0) {
      data_ = ::mmap(nullptr, size_, PROT_READ, MAP_PRIVATE, fd, 0);
      if (data_ == MAP_FAILED) {
        ::close(fd);
        throw std::runtime_error("mapped_file: mmap failed for " + path);
      }
    }
    ::close(fd);
  }

  mapped_file(const mapped_file &) = delete;
  mapped_file &operator=(const mapped_file &) = delete;

  ~mapped_file() {
    if (data_ != nullptr && data_ != MAP_FAILED && size_ > 0) {
      ::munmap(data_, size_);
    }
  }

  const char *const_data() const { return static_cast<const char *>(data_); }
  size_t size() const { return size_; }

 private:
  void *data_ = nullptr;
  size_t size_ = 0;
};

}  // namespace iostreams
}  // namespace boost
