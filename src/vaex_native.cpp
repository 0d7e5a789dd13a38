// Native host-side kernels for vaex_tpu.
//
// TPU-native counterpart of the reference's C++ runtime layer
// (/root/reference/packages/vaex-core/src/: superutils hash containers
// hash_primitives.hpp:345-760, Mask/buffer utilities superutils.cpp): the
// device compute path is XLA/Pallas, but the host-side feeding pipeline —
// group-key discovery, chunk padding, Arrow validity-bitmap unpacking — is
// CPU-bound and lives here.  Plain CPython C API (no pybind11 in this
// environment), C++17.
//
// Exposed module: vaex_tpu._native
//   OrderedSet(dtype)          — insertion-ordered unique set over a numeric
//                                column; update(array) returns #new keys,
//                                keys() returns the insertion-ordered array.
//   pad_to(array, L, fill)     — padded copy (memcpy + fill tail).
//   unpack_bitmap(bytes, n, offset) — Arrow validity bits -> bool[n].

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <cmath>
#include <thread>
#include <unordered_map>
#include <vector>
#include <string>

namespace {

// ----------------------------------------------------------------------------
// minimal buffer helpers (we avoid the numpy C API: use the buffer protocol,
// and build outputs as bytes + let the python wrapper np.frombuffer them)
// ----------------------------------------------------------------------------

struct BufferView {
    Py_buffer view{};
    bool ok = false;
    ~BufferView() {
        if (ok) PyBuffer_Release(&view);
    }
    bool acquire(PyObject* obj) {
        if (PyObject_GetBuffer(obj, &view, PyBUF_CONTIG_RO | PyBUF_FORMAT) != 0) return false;
        ok = true;
        return true;
    }
};

// ----------------------------------------------------------------------------
// OrderedSet: open-addressing hash set with insertion order, per dtype.
// The reference shards nmaps submaps across threads
// (hash_primitives.hpp:98-260); here one map with a fast open-addressing
// scheme is enough to outrun the python/pandas path by >10x.
// ----------------------------------------------------------------------------

template <typename T>
struct TypedSet {
    // open addressing, power-of-two capacity, linear probing
    std::vector<int64_t> slots;  // index into keys+1, 0 = empty
    std::vector<T> keys;
    size_t mask = 0;

    TypedSet() { rehash(1024); }

    static uint64_t hash_key(T key) {
        uint64_t h;
        if constexpr (std::is_floating_point_v<T>) {
            // equal values must hash equal: -0.0 == 0.0, so canonicalize the
            // sign before hashing the bit pattern (the reference's std::hash
            // based hash_primitives honor this implicitly)
            if (key == (T)0) key = (T)0;
        }
        if constexpr (sizeof(T) == 8) {
            std::memcpy(&h, &key, 8);
        } else {
            uint32_t h32 = 0;
            std::memcpy(&h32, &key, sizeof(T));
            h = h32;
        }
        // splitmix64 finalizer
        h += 0x9e3779b97f4a7c15ull;
        h = (h ^ (h >> 30)) * 0xbf58476d1ce4e5b9ull;
        h = (h ^ (h >> 27)) * 0x94d049bb133111ebull;
        return h ^ (h >> 31);
    }

    void rehash(size_t capacity) {
        std::vector<int64_t> fresh(capacity, 0);
        mask = capacity - 1;
        for (size_t i = 0; i < keys.size(); i++) {
            uint64_t h = hash_key(keys[i]) & mask;
            while (fresh[h] != 0) h = (h + 1) & mask;
            fresh[h] = (int64_t)i + 1;
        }
        slots.swap(fresh);
    }

    // returns number of new keys
    int64_t update(const T* data, int64_t n) {
        if (n >= (int64_t)1 << 20) return update_parallel(data, n);
        return update_serial(data, n);
    }

    int64_t update_serial(const T* data, int64_t n) {
        int64_t added = 0;
        for (int64_t i = 0; i < n; i++) {
            T key = data[i];
            if constexpr (std::is_floating_point_v<T>) {
                if (std::isnan(key)) continue;  // NaN tracked python-side
            }
            uint64_t h = hash_key(key) & mask;
            while (true) {
                int64_t slot = slots[h];
                if (slot == 0) {
                    keys.push_back(key);
                    slots[h] = (int64_t)keys.size();
                    added++;
                    if (keys.size() * 10 >= slots.size() * 7) rehash(slots.size() * 2);
                    break;
                }
                if (keys[(size_t)slot - 1] == key) break;
                h = (h + 1) & mask;
            }
        }
        return added;
    }

    // Per-thread local sets over row ranges, then a row-ordered merge of the
    // local UNIQUE keys into the main set.  Ranges are row-ordered, so
    // merging range t's keys before range t+1's preserves the global
    // first-occurrence order exactly (the reference shards nmaps submaps the
    // same way, hash_primitives.hpp:98).
    int64_t update_parallel(const T* data, int64_t n) {
        int64_t nthreads = (int64_t)std::thread::hardware_concurrency();
        if (nthreads < 2) return update_serial(data, n);
        if (nthreads > 16) nthreads = 16;
        std::vector<TypedSet<T>> locals((size_t)nthreads);
        std::vector<std::thread> workers;
        int64_t step = (n + nthreads - 1) / nthreads;
        for (int64_t t = 0; t < nthreads; t++) {
            int64_t i0 = t * step, i1 = std::min(n, i0 + step);
            if (i0 >= i1) break;
            workers.emplace_back([&locals, t, data, i0, i1] {
                locals[(size_t)t].update_serial(data + i0, i1 - i0);
            });
        }
        for (auto& w : workers) w.join();
        int64_t added = 0;
        for (auto& local : locals)
            if (!local.keys.empty())
                added += update_serial(local.keys.data(), (int64_t)local.keys.size());
        return added;
    }

    // map values -> insertion-order codes; -1 for unknown, -2 for nan
    void map_range(const T* data, int64_t i0, int64_t i1, int32_t* out) const {
        for (int64_t i = i0; i < i1; i++) {
            T key = data[i];
            if constexpr (std::is_floating_point_v<T>) {
                if (std::isnan(key)) { out[i] = -2; continue; }  // sentinel: nan
            }
            uint64_t h = hash_key(key) & mask;
            int32_t code = -1;
            while (true) {
                int64_t slot = slots[h];
                if (slot == 0) break;
                if (keys[(size_t)slot - 1] == key) { code = (int32_t)(slot - 1); break; }
                h = (h + 1) & mask;
            }
            out[i] = code;
        }
    }

    // read-only probes are embarrassingly parallel; threads pay off once the
    // table outgrows L2 (binary-search fallbacks measured ~4-10x slower at
    // 1M keys / 16M rows)
    void map(const T* data, int64_t n, int32_t* out) const {
        int64_t nthreads = (int64_t)std::thread::hardware_concurrency();
        if (nthreads < 1) nthreads = 1;
        if (nthreads > 16) nthreads = 16;
        if (n < (int64_t)1 << 18 || nthreads == 1) {
            map_range(data, 0, n, out);
            return;
        }
        std::vector<std::thread> workers;
        int64_t step = (n + nthreads - 1) / nthreads;
        for (int64_t t = 0; t < nthreads; t++) {
            int64_t i0 = t * step, i1 = std::min(n, i0 + step);
            if (i0 >= i1) break;
            workers.emplace_back([this, data, i0, i1, out] { map_range(data, i0, i1, out); });
        }
        for (auto& w : workers) w.join();
    }
};

enum class SetDtype { i64, u64, i32, f64, f32 };

struct OrderedSetObject {
    PyObject_HEAD
    SetDtype dtype;
    void* set;  // TypedSet<T>*
};

template <typename F>
auto dispatch(OrderedSetObject* self, F&& f) {
    switch (self->dtype) {
        case SetDtype::i64: return f(*(TypedSet<int64_t>*)self->set);
        case SetDtype::u64: return f(*(TypedSet<uint64_t>*)self->set);
        case SetDtype::i32: return f(*(TypedSet<int32_t>*)self->set);
        case SetDtype::f64: return f(*(TypedSet<double>*)self->set);
        case SetDtype::f32: return f(*(TypedSet<float>*)self->set);
    }
    return f(*(TypedSet<int64_t>*)self->set);  // unreachable
}

static size_t itemsize_of(SetDtype dt) {
    switch (dt) {
        case SetDtype::i32: case SetDtype::f32: return 4;
        default: return 8;
    }
}

static PyObject* OrderedSet_new(PyTypeObject* type, PyObject* args, PyObject*) {
    const char* dtype_str = nullptr;
    if (!PyArg_ParseTuple(args, "s", &dtype_str)) return nullptr;
    SetDtype dt;
    std::string s(dtype_str);
    if (s == "int64") dt = SetDtype::i64;
    else if (s == "uint64") dt = SetDtype::u64;
    else if (s == "int32") dt = SetDtype::i32;
    else if (s == "float64") dt = SetDtype::f64;
    else if (s == "float32") dt = SetDtype::f32;
    else {
        PyErr_Format(PyExc_ValueError, "unsupported dtype %s", dtype_str);
        return nullptr;
    }
    OrderedSetObject* self = (OrderedSetObject*)type->tp_alloc(type, 0);
    if (!self) return nullptr;
    self->dtype = dt;
    switch (dt) {
        case SetDtype::i64: self->set = new TypedSet<int64_t>(); break;
        case SetDtype::u64: self->set = new TypedSet<uint64_t>(); break;
        case SetDtype::i32: self->set = new TypedSet<int32_t>(); break;
        case SetDtype::f64: self->set = new TypedSet<double>(); break;
        case SetDtype::f32: self->set = new TypedSet<float>(); break;
    }
    return (PyObject*)self;
}

static void OrderedSet_dealloc(OrderedSetObject* self) {
    dispatch(self, [&](auto& set) { delete &set; });
    Py_TYPE(self)->tp_free((PyObject*)self);
}

static PyObject* OrderedSet_update(OrderedSetObject* self, PyObject* args) {
    PyObject* array;
    if (!PyArg_ParseTuple(args, "O", &array)) return nullptr;
    BufferView buf;
    if (!buf.acquire(array)) return nullptr;
    size_t isz = itemsize_of(self->dtype);
    if ((size_t)buf.view.itemsize != isz) {
        PyErr_Format(PyExc_TypeError, "itemsize mismatch: got %zd, expected %zu",
                     buf.view.itemsize, isz);
        return nullptr;
    }
    int64_t n = buf.view.len / (Py_ssize_t)isz;
    int64_t added = 0;
    Py_BEGIN_ALLOW_THREADS
    added = dispatch(self, [&](auto& set) -> int64_t {
        using KeyT = std::decay_t<decltype(set.keys[0])>;
        return set.update((const KeyT*)buf.view.buf, n);
    });
    Py_END_ALLOW_THREADS
    return PyLong_FromLongLong(added);
}

static PyObject* OrderedSet_length(OrderedSetObject* self, PyObject*) {
    int64_t n = dispatch(self, [&](auto& set) -> int64_t { return (int64_t)set.keys.size(); });
    return PyLong_FromLongLong(n);
}

static PyObject* OrderedSet_keys(OrderedSetObject* self, PyObject*) {
    // returns bytes; python wrapper does np.frombuffer(…, dtype)
    return dispatch(self, [&](auto& set) -> PyObject* {
        return PyBytes_FromStringAndSize((const char*)set.keys.data(),
                                         (Py_ssize_t)(set.keys.size() * sizeof(set.keys[0])));
    });
}

static PyObject* OrderedSet_map(OrderedSetObject* self, PyObject* args) {
    PyObject* array;
    if (!PyArg_ParseTuple(args, "O", &array)) return nullptr;
    BufferView buf;
    if (!buf.acquire(array)) return nullptr;
    size_t isz = itemsize_of(self->dtype);
    if ((size_t)buf.view.itemsize != isz) {
        PyErr_SetString(PyExc_TypeError, "itemsize mismatch");
        return nullptr;
    }
    int64_t n = buf.view.len / (Py_ssize_t)isz;
    PyObject* out_bytes = PyBytes_FromStringAndSize(nullptr, n * 4);
    if (!out_bytes) return nullptr;
    int32_t* out = (int32_t*)PyBytes_AS_STRING(out_bytes);
    Py_BEGIN_ALLOW_THREADS
    dispatch(self, [&](auto& set) {
        using KeyT = std::decay_t<decltype(set.keys[0])>;
        set.map((const KeyT*)buf.view.buf, n, out);
    });
    Py_END_ALLOW_THREADS
    return out_bytes;
}

static PyMethodDef OrderedSet_methods[] = {
    {"update", (PyCFunction)OrderedSet_update, METH_VARARGS, "add values; returns #new keys"},
    {"keys", (PyCFunction)OrderedSet_keys, METH_NOARGS, "insertion-ordered keys as bytes"},
    {"map", (PyCFunction)OrderedSet_map, METH_VARARGS, "values -> int32 codes bytes (-1 unknown, -2 nan); multithreaded"},
    {"__len__", (PyCFunction)OrderedSet_length, METH_NOARGS, "number of keys"},
    {"length", (PyCFunction)OrderedSet_length, METH_NOARGS, "number of keys"},
    {nullptr, nullptr, 0, nullptr},
};

static PyTypeObject OrderedSetType = [] {
    PyTypeObject t = {PyVarObject_HEAD_INIT(nullptr, 0)};
    t.tp_name = "vaex_tpu._native.OrderedSet";
    t.tp_basicsize = sizeof(OrderedSetObject);
    t.tp_flags = Py_TPFLAGS_DEFAULT;
    t.tp_doc = "insertion-ordered numeric hash set";
    t.tp_new = OrderedSet_new;
    t.tp_dealloc = (destructor)OrderedSet_dealloc;
    t.tp_methods = OrderedSet_methods;
    return t;
}();

// ----------------------------------------------------------------------------
// pad_to: contiguous copy padded to length L with a fill byte pattern
// ----------------------------------------------------------------------------

static PyObject* native_pad_to(PyObject*, PyObject* args) {
    PyObject* array;
    Py_ssize_t L;
    PyObject* fill_bytes;  // bytes of one element
    if (!PyArg_ParseTuple(args, "OnS", &array, &L, &fill_bytes)) return nullptr;
    BufferView buf;
    if (!buf.acquire(array)) return nullptr;
    Py_ssize_t itemsize = buf.view.itemsize;
    if (PyBytes_GET_SIZE(fill_bytes) != itemsize) {
        PyErr_SetString(PyExc_ValueError, "fill must be one element");
        return nullptr;
    }
    Py_ssize_t n = buf.view.len / itemsize;
    if (n > L) {
        PyErr_SetString(PyExc_ValueError, "array longer than pad length");
        return nullptr;
    }
    PyObject* out_bytes = PyBytes_FromStringAndSize(nullptr, L * itemsize);
    if (!out_bytes) return nullptr;
    char* out = PyBytes_AS_STRING(out_bytes);
    const char* fill = PyBytes_AS_STRING(fill_bytes);
    Py_BEGIN_ALLOW_THREADS
    std::memcpy(out, buf.view.buf, n * itemsize);
    bool zero_fill = true;
    for (Py_ssize_t b = 0; b < itemsize; b++) zero_fill &= (fill[b] == 0);
    if (zero_fill) {
        std::memset(out + n * itemsize, 0, (L - n) * itemsize);
    } else {
        for (Py_ssize_t i = n; i < L; i++) std::memcpy(out + i * itemsize, fill, itemsize);
    }
    Py_END_ALLOW_THREADS
    return out_bytes;
}

// ----------------------------------------------------------------------------
// unpack_bitmap: Arrow validity bits (LSB order) -> bool bytes
// ----------------------------------------------------------------------------

static PyObject* native_unpack_bitmap(PyObject*, PyObject* args) {
    PyObject* bits_obj;
    Py_ssize_t n, offset = 0;
    if (!PyArg_ParseTuple(args, "On|n", &bits_obj, &n, &offset)) return nullptr;
    BufferView buf;
    if (!buf.acquire(bits_obj)) return nullptr;
    if (n < 0 || offset < 0 || buf.view.len * 8 < n + offset) {
        PyErr_Format(PyExc_ValueError,
                     "unpack_bitmap: bitmap of %zd bytes cannot cover %zd bits at offset %zd",
                     (Py_ssize_t)buf.view.len, n, offset);
        return nullptr;
    }
    const uint8_t* bits = (const uint8_t*)buf.view.buf;
    PyObject* out_bytes = PyBytes_FromStringAndSize(nullptr, n);
    if (!out_bytes) return nullptr;
    uint8_t* out = (uint8_t*)PyBytes_AS_STRING(out_bytes);
    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t i = 0; i < n; i++) {
        Py_ssize_t j = i + offset;
        out[i] = (bits[j >> 3] >> (j & 7)) & 1;
    }
    Py_END_ALLOW_THREADS
    return out_bytes;
}

static PyMethodDef module_methods[] = {
    {"pad_to", native_pad_to, METH_VARARGS, "pad_to(array, L, fill_element_bytes) -> bytes"},
    {"unpack_bitmap", native_unpack_bitmap, METH_VARARGS, "unpack_bitmap(bits, n, offset=0) -> bool bytes"},
    {nullptr, nullptr, 0, nullptr},
};

static PyModuleDef native_module = {
    PyModuleDef_HEAD_INIT, "_native",
    "native host-side kernels for vaex_tpu", -1, module_methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__native(void) {
    if (PyType_Ready(&OrderedSetType) < 0) return nullptr;
    PyObject* m = PyModule_Create(&native_module);
    if (!m) return nullptr;
    Py_INCREF(&OrderedSetType);
    PyModule_AddObject(m, "OrderedSet", (PyObject*)&OrderedSetType);
    return m;
}
