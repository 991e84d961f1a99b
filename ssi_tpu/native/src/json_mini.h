// Minimal JSON parser for safetensors headers.
//
// The safetensors header is a single flat-ish JSON object:
//   {"__metadata__": {"k": "v"}, "name": {"dtype": "BF16", "shape": [..],
//    "data_offsets": [b, e]}, ...}
// so this parser supports exactly the JSON value grammar (objects, arrays,
// strings with escapes incl. \uXXXX, integers/floats, true/false/null) and
// nothing else — no streaming, no comments. First-party replacement for the
// header parsing the reference delegates to the safetensors Rust crate
// (ref: ssi/checkpoint.py uses safetensors.torch save/load_file).
#pragma once

#include <cstdint>
#include <map>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

namespace jsonmini {

struct Value;
using ValuePtr = std::shared_ptr<Value>;

struct Value {
  enum class Kind { Null, Bool, Int, Double, Str, Arr, Obj } kind = Kind::Null;
  bool b = false;
  int64_t i = 0;
  double d = 0.0;
  std::string s;
  std::vector<ValuePtr> arr;
  // Insertion-ordered object: safetensors readers don't need ordering, but
  // keeping it makes round-trip tests deterministic.
  std::vector<std::pair<std::string, ValuePtr>> obj;

  const ValuePtr* find(const std::string& key) const {
    for (const auto& kv : obj)
      if (kv.first == key) return &kv.second;
    return nullptr;
  }
};

class Parser {
 public:
  explicit Parser(const char* data, size_t len) : p_(data), end_(data + len) {}

  ValuePtr parse() {
    skip_ws();
    ValuePtr v = parse_value();
    skip_ws();
    if (p_ != end_) throw std::runtime_error("json: trailing data");
    return v;
  }

 private:
  const char* p_;
  const char* end_;

  [[noreturn]] void fail(const char* msg) { throw std::runtime_error(std::string("json: ") + msg); }

  void skip_ws() {
    while (p_ != end_ && (*p_ == ' ' || *p_ == '\t' || *p_ == '\n' || *p_ == '\r')) ++p_;
  }

  char peek() {
    if (p_ == end_) fail("unexpected end");
    return *p_;
  }

  char next() {
    if (p_ == end_) fail("unexpected end");
    return *p_++;
  }

  void expect(char c) {
    if (next() != c) fail("unexpected character");
  }

  ValuePtr parse_value() {
    switch (peek()) {
      case '{': return parse_object();
      case '[': return parse_array();
      case '"': {
        auto v = std::make_shared<Value>();
        v->kind = Value::Kind::Str;
        v->s = parse_string();
        return v;
      }
      case 't': return parse_lit("true", [] (Value& v) { v.kind = Value::Kind::Bool; v.b = true; });
      case 'f': return parse_lit("false", [] (Value& v) { v.kind = Value::Kind::Bool; v.b = false; });
      case 'n': return parse_lit("null", [] (Value& v) { v.kind = Value::Kind::Null; });
      default: return parse_number();
    }
  }

  template <typename F>
  ValuePtr parse_lit(const char* lit, F fill) {
    for (const char* q = lit; *q; ++q)
      if (next() != *q) fail("bad literal");
    auto v = std::make_shared<Value>();
    fill(*v);
    return v;
  }

  ValuePtr parse_object() {
    expect('{');
    auto v = std::make_shared<Value>();
    v->kind = Value::Kind::Obj;
    skip_ws();
    if (peek() == '}') { ++p_; return v; }
    while (true) {
      skip_ws();
      std::string key = parse_string();
      skip_ws();
      expect(':');
      skip_ws();
      v->obj.emplace_back(std::move(key), parse_value());
      skip_ws();
      char c = next();
      if (c == '}') return v;
      if (c != ',') fail("expected , or }");
    }
  }

  ValuePtr parse_array() {
    expect('[');
    auto v = std::make_shared<Value>();
    v->kind = Value::Kind::Arr;
    skip_ws();
    if (peek() == ']') { ++p_; return v; }
    while (true) {
      skip_ws();
      v->arr.push_back(parse_value());
      skip_ws();
      char c = next();
      if (c == ']') return v;
      if (c != ',') fail("expected , or ]");
    }
  }

  std::string parse_string() {
    expect('"');
    std::string out;
    while (true) {
      char c = next();
      if (c == '"') return out;
      if (c == '\\') {
        char e = next();
        switch (e) {
          case '"': out += '"'; break;
          case '\\': out += '\\'; break;
          case '/': out += '/'; break;
          case 'b': out += '\b'; break;
          case 'f': out += '\f'; break;
          case 'n': out += '\n'; break;
          case 'r': out += '\r'; break;
          case 't': out += '\t'; break;
          case 'u': {
            uint32_t cp = parse_hex4();
            if (cp >= 0xD800 && cp <= 0xDBFF) {  // surrogate pair
              if (next() != '\\' || next() != 'u') fail("bad surrogate");
              uint32_t lo = parse_hex4();
              if (lo < 0xDC00 || lo > 0xDFFF) fail("bad low surrogate");
              cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00);
            }
            append_utf8(out, cp);
            break;
          }
          default: fail("bad escape");
        }
      } else {
        out += c;
      }
    }
  }

  uint32_t parse_hex4() {
    uint32_t v = 0;
    for (int k = 0; k < 4; ++k) {
      char c = next();
      v <<= 4;
      if (c >= '0' && c <= '9') v |= c - '0';
      else if (c >= 'a' && c <= 'f') v |= c - 'a' + 10;
      else if (c >= 'A' && c <= 'F') v |= c - 'A' + 10;
      else fail("bad hex digit");
    }
    return v;
  }

  static void append_utf8(std::string& out, uint32_t cp) {
    if (cp < 0x80) {
      out += static_cast<char>(cp);
    } else if (cp < 0x800) {
      out += static_cast<char>(0xC0 | (cp >> 6));
      out += static_cast<char>(0x80 | (cp & 0x3F));
    } else if (cp < 0x10000) {
      out += static_cast<char>(0xE0 | (cp >> 12));
      out += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
      out += static_cast<char>(0x80 | (cp & 0x3F));
    } else {
      out += static_cast<char>(0xF0 | (cp >> 18));
      out += static_cast<char>(0x80 | ((cp >> 12) & 0x3F));
      out += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
      out += static_cast<char>(0x80 | (cp & 0x3F));
    }
  }

  ValuePtr parse_number() {
    const char* start = p_;
    if (peek() == '-') ++p_;
    bool is_double = false;
    while (p_ != end_) {
      char c = *p_;
      if (c >= '0' && c <= '9') { ++p_; continue; }
      if (c == '.' || c == 'e' || c == 'E' || c == '+' || c == '-') { is_double = true; ++p_; continue; }
      break;
    }
    if (p_ == start) fail("bad number");
    std::string text(start, p_ - start);
    auto v = std::make_shared<Value>();
    if (is_double) {
      v->kind = Value::Kind::Double;
      v->d = std::stod(text);
    } else {
      v->kind = Value::Kind::Int;
      v->i = std::stoll(text);
    }
    return v;
  }
};

inline ValuePtr parse(const char* data, size_t len) { return Parser(data, len).parse(); }

// Serialize a string with JSON escaping (for header writing).
inline void write_escaped(std::string& out, const std::string& s) {
  out += '"';
  for (unsigned char c : s) {
    switch (c) {
      case '"': out += "\\\""; break;
      case '\\': out += "\\\\"; break;
      case '\b': out += "\\b"; break;
      case '\f': out += "\\f"; break;
      case '\n': out += "\\n"; break;
      case '\r': out += "\\r"; break;
      case '\t': out += "\\t"; break;
      default:
        if (c < 0x20) {
          char buf[8];
          snprintf(buf, sizeof(buf), "\\u%04x", c);
          out += buf;
        } else {
          out += static_cast<char>(c);  // UTF-8 bytes pass through
        }
    }
  }
  out += '"';
}

}  // namespace jsonmini
