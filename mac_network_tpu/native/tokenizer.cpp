// Native host-side tokenizer/encoder for the preprocessing hot loop.
//
// The reference preprocesses ~700k CLEVR questions in pure Python
// (tokenize + vocab encode, reference: preprocess.py:188-225, 425-426); on
// the single-core TPU host this dominates cold-start time.  This CPython
// extension implements the same tokenizer rules (kept punctuation becomes
// separate tokens, ignored punctuation stripped, lowercase, split on
// spaces) and direct vocabulary encoding, ~10-30x faster than the Python
// loop.  data/native.py builds it on first use and falls back to the
// Python implementation if a toolchain is unavailable.
//
// Build: g++ -O2 -shared -fPIC -std=c++17 $(python3-config --includes)
//        tokenizer.cpp -o _mac_native.so

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <string>
#include <vector>

namespace {

// Tokenize one UTF-8 question string with the reference's rules.
// kept: punctuation emitted as standalone tokens; ignored: dropped.
void tokenize(const std::string &text, const std::string &kept,
              const std::string &ignored, std::vector<std::string> *out) {
  std::string cur;
  auto flush = [&]() {
    if (!cur.empty()) {
      out->push_back(cur);
      cur.clear();
    }
  };
  for (unsigned char c : text) {
    if (c == ' ') {
      flush();
    } else if (kept.find(static_cast<char>(c)) != std::string::npos) {
      flush();
      out->push_back(std::string(1, static_cast<char>(c)));
    } else if (ignored.find(static_cast<char>(c)) != std::string::npos) {
      // dropped entirely (reference replaces with "")
    } else {
      cur.push_back(static_cast<char>(
          (c >= 'A' && c <= 'Z') ? c - 'A' + 'a' : c));
    }
  }
  flush();
}

// tokenize_batch(texts, kept, ignored) -> list[list[str]]
PyObject *TokenizeBatch(PyObject *, PyObject *args) {
  PyObject *texts;
  const char *kept_c;
  const char *ignored_c;
  if (!PyArg_ParseTuple(args, "Oss", &texts, &kept_c, &ignored_c)) {
    return nullptr;
  }
  std::string kept(kept_c), ignored(ignored_c);
  PyObject *seq = PySequence_Fast(texts, "texts must be a sequence");
  if (seq == nullptr) return nullptr;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  PyObject *result = PyList_New(n);
  if (result == nullptr) {
    Py_DECREF(seq);
    return nullptr;
  }
  std::vector<std::string> toks;
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject *item = PySequence_Fast_GET_ITEM(seq, i);
    Py_ssize_t len;
    const char *utf8 = PyUnicode_AsUTF8AndSize(item, &len);
    if (utf8 == nullptr) {
      Py_DECREF(seq);
      Py_DECREF(result);
      return nullptr;
    }
    toks.clear();
    tokenize(std::string(utf8, len), kept, ignored, &toks);
    PyObject *lst = PyList_New(static_cast<Py_ssize_t>(toks.size()));
    for (size_t j = 0; j < toks.size(); ++j) {
      PyList_SET_ITEM(lst, static_cast<Py_ssize_t>(j),
                      PyUnicode_FromStringAndSize(toks[j].data(),
                                                  toks[j].size()));
    }
    PyList_SET_ITEM(result, i, lst);
  }
  Py_DECREF(seq);
  return result;
}

// encode_batch(token_lists, sym2id, unk) -> list[list[int]]
PyObject *EncodeBatch(PyObject *, PyObject *args) {
  PyObject *token_lists;
  PyObject *sym2id;
  long unk;
  if (!PyArg_ParseTuple(args, "OOl", &token_lists, &sym2id, &unk)) {
    return nullptr;
  }
  if (!PyDict_Check(sym2id)) {
    PyErr_SetString(PyExc_TypeError, "sym2id must be a dict");
    return nullptr;
  }
  PyObject *seq = PySequence_Fast(token_lists, "token_lists must be a sequence");
  if (seq == nullptr) return nullptr;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  PyObject *result = PyList_New(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject *toks = PySequence_Fast_GET_ITEM(seq, i);
    PyObject *tseq = PySequence_Fast(toks, "tokens must be a sequence");
    if (tseq == nullptr) {
      Py_DECREF(seq);
      Py_DECREF(result);
      return nullptr;
    }
    Py_ssize_t m = PySequence_Fast_GET_SIZE(tseq);
    PyObject *ids = PyList_New(m);
    for (Py_ssize_t j = 0; j < m; ++j) {
      PyObject *tok = PySequence_Fast_GET_ITEM(tseq, j);
      PyObject *id_obj = PyDict_GetItem(sym2id, tok);  // borrowed
      long v = (id_obj != nullptr) ? PyLong_AsLong(id_obj) : unk;
      PyList_SET_ITEM(ids, j, PyLong_FromLong(v));
    }
    Py_DECREF(tseq);
    PyList_SET_ITEM(result, i, ids);
  }
  Py_DECREF(seq);
  return result;
}

PyMethodDef kMethods[] = {
    {"tokenize_batch", TokenizeBatch, METH_VARARGS,
     "Tokenize a batch of question strings (reference tokenizer rules)."},
    {"encode_batch", EncodeBatch, METH_VARARGS,
     "Encode token lists to vocabulary ids with an <UNK> fallback."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_mac_native",
    "Native host ops for mac_network_tpu preprocessing.", -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit__mac_native() { return PyModule_Create(&kModule); }
