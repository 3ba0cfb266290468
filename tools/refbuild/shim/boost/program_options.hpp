// Minimal boost::program_options shim (build-only, for A/B harness).
// Supports: bool_switch, value<T>(&v)->default_value(x)->multitoken(),
// long/short option names ("name,n"), store(parse_command_line(...)), notify.
#ifndef BOOST_PO_SHIM_HPP
#define BOOST_PO_SHIM_HPP
#include <cstdint>
#include <iostream>
#include <memory>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace boost {
namespace program_options {

struct value_semantic {
  virtual ~value_semantic() = default;
  virtual bool is_switch() const { return false; }
  virtual bool is_multitoken() const { return false; }
  // consume one token (non-switch)
  virtual void parse_token(const std::string &tok) = 0;
  virtual void set_switch() {}
  virtual void apply_default() {}
};

template <typename T>
inline T from_string(const std::string &s) {
  std::istringstream iss(s);
  T v;
  iss >> v;
  if (iss.fail()) throw std::runtime_error("bad option value: " + s);
  return v;
}
template <>
inline std::string from_string<std::string>(const std::string &s) {
  return s;
}

template <typename T>
struct typed_value : value_semantic {
  T *target;
  bool multi = false;
  bool has_default = false;
  T def{};
  explicit typed_value(T *t) : target(t) {}
  typed_value *default_value(const T &v) {
    has_default = true;
    def = v;
    return this;
  }
  typed_value *multitoken() {
    multi = true;
    return this;
  }
  bool is_multitoken() const override { return multi; }
  void parse_token(const std::string &tok) override { *target = from_string<T>(tok); }
  void apply_default() override {
    if (has_default) *target = def;
  }
};

template <typename E>
struct typed_value<std::vector<E>> : value_semantic {
  std::vector<E> *target;
  bool multi = false;
  explicit typed_value(std::vector<E> *t) : target(t) {}
  typed_value *default_value(const std::vector<E> &v) {
    *target = v;
    return this;
  }
  typed_value *multitoken() {
    multi = true;
    return this;
  }
  bool is_multitoken() const override { return multi; }
  void parse_token(const std::string &tok) override {
    target->push_back(from_string<E>(tok));
  }
};

struct bool_switch_t : value_semantic {
  bool *target;
  explicit bool_switch_t(bool *t) : target(t) { *target = false; }
  bool is_switch() const override { return true; }
  void parse_token(const std::string &) override {}
  void set_switch() override { *target = true; }
};

template <typename T>
inline typed_value<T> *value(T *t) {
  return new typed_value<T>(t);
}
inline bool_switch_t *bool_switch(bool *t) { return new bool_switch_t(t); }

struct option_desc {
  std::string long_name, short_name, help;
  std::shared_ptr<value_semantic> sem;  // null => informational switch w/o target
};

class options_description;

struct options_adder {
  options_description *d;
  options_adder &operator()(const char *name, const char *help);
  options_adder &operator()(const char *name, value_semantic *sem, const char *help);
};

class options_description {
 public:
  std::string caption;
  std::vector<option_desc> opts;
  explicit options_description(const std::string &c = "") : caption(c) {}
  options_adder add_options() { return options_adder{this}; }
  void add(const std::string &name, value_semantic *sem, const char *help) {
    option_desc od;
    auto comma = name.find(',');
    od.long_name = name.substr(0, comma);
    if (comma != std::string::npos) od.short_name = name.substr(comma + 1);
    od.help = help ? help : "";
    od.sem.reset(sem);
    opts.push_back(std::move(od));
  }
  const option_desc *find(const std::string &tok, bool is_short) const {
    for (auto &o : opts)
      if ((is_short && o.short_name == tok) || (!is_short && o.long_name == tok))
        return &o;
    return nullptr;
  }
};

inline options_adder &options_adder::operator()(const char *name, const char *help) {
  d->add(name, nullptr, help);
  return *this;
}
inline options_adder &options_adder::operator()(const char *name, value_semantic *sem,
                                                const char *help) {
  d->add(name, sem, help);
  return *this;
}

inline std::ostream &operator<<(std::ostream &os, const options_description &d) {
  os << d.caption << ":\n";
  for (auto &o : d.opts) {
    os << "  --" << o.long_name;
    if (!o.short_name.empty()) os << " [ -" << o.short_name << " ]";
    os << "\n      " << o.help << "\n";
  }
  return os;
}

struct parsed_options {
  const options_description *desc;
  std::vector<std::string> args;
};

inline parsed_options parse_command_line(int argc, const char *const argv[],
                                         const options_description &desc) {
  parsed_options p;
  p.desc = &desc;
  for (int i = 1; i < argc; i++) p.args.push_back(argv[i]);
  return p;
}

struct variables_map {
  int dummy = 0;
  size_t count(const std::string &) const { return 0; }
};

inline void store(const parsed_options &p, variables_map &) {
  // apply defaults first
  for (auto &o : p.desc->opts)
    if (o.sem) o.sem->apply_default();
  size_t i = 0;
  auto &args = p.args;
  while (i < args.size()) {
    const std::string &a = args[i];
    const option_desc *od = nullptr;
    if (a.rfind("--", 0) == 0)
      od = p.desc->find(a.substr(2), false);
    else if (a.rfind("-", 0) == 0 && a.size() > 1)
      od = p.desc->find(a.substr(1), true);
    if (!od) throw std::runtime_error("unknown option: " + a);
    i++;
    if (!od->sem) continue;
    if (od->sem->is_switch()) {
      od->sem->set_switch();
      continue;
    }
    if (i >= args.size()) throw std::runtime_error("missing value for " + a);
    od->sem->parse_token(args[i++]);
    if (od->sem->is_multitoken())
      while (i < args.size() && args[i].rfind("-", 0) != 0)
        od->sem->parse_token(args[i++]);
  }
}

inline void notify(variables_map &) {}

}  // namespace program_options
}  // namespace boost
#endif
