// Native Brainfuck interpreter with execution-trace recording.
//
// TPU-native framework's fast path for trace generation (the reference's
// Machine::execute hot loop, crates/brainfuck_vm/src/machine.rs:141-234).
// Semantics are identical to the Python fallback in vm/machine.py:
//   - cells and mp wrap mod p = 2^31 - 1
//   - mvi = mv^-1 (0 for 0), memoized
//   - '[' arg points at the ']' arg cell; taken jumps rely on the trailing
//     ip += 1 of the clock tick
//   - a final row with ci = ni = 0 is appended
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

static const uint64_t P = 2147483647ULL;  // 2^31 - 1

static inline uint32_t mulmod(uint32_t a, uint32_t b) {
    return (uint32_t)(((uint64_t)a * b) % P);
}

static uint32_t inv_m31(uint32_t x) {
    if (x == 0) return 0;
    // x^(p-2) by square-and-multiply
    uint64_t e = P - 2;
    uint32_t base = x, acc = 1;
    while (e) {
        if (e & 1) acc = mulmod(acc, base);
        base = mulmod(base, base);
        e >>= 1;
    }
    return acc;
}

extern "C" {

// Error codes
enum {
    BF_OK = 0,
    BF_ERR_INPUT_EOF = 1,
    BF_ERR_TRACE_OVERFLOW = 2,
    BF_ERR_BAD_INSTRUCTION = 3,
    BF_ERR_MP_RANGE = 4,
    BF_ERR_OUTPUT_OVERFLOW = 5,
};

// Executes the program. If trace != nullptr, records 7 uint32 per step
// (clk, ip, ci, ni, mp, mv, mvi) up to trace_cap rows; *trace_len is set to
// the number of rows written (or needed, on BF_ERR_TRACE_OVERFLOW).
int bf_execute(const uint32_t* code, int64_t code_len,
               const uint8_t* input, int64_t input_len,
               uint8_t* output, int64_t output_cap, int64_t* output_len,
               uint32_t* ram, int64_t ram_size,
               uint32_t* trace, int64_t trace_cap, int64_t* trace_len) {
    std::unordered_map<uint32_t, uint32_t> inv_cache;
    inv_cache.reserve(1024);
    inv_cache[0] = 0;

    uint64_t clk = 0, ip = 0;
    uint32_t mp = 0, mv = 0, mvi = 0;
    int64_t in_pos = 0, out_pos = 0, rows = 0;

    auto record = [&](uint32_t ci, uint32_t ni) -> bool {
        if (rows >= trace_cap) return false;  // cap applies in count mode too
        if (trace) {
            uint32_t* r = trace + rows * 7;
            r[0] = (uint32_t)(clk % P);
            r[1] = (uint32_t)(ip % P);
            r[2] = ci;
            r[3] = ni;
            r[4] = mp;
            r[5] = mv;
            r[6] = mvi;
        }
        rows++;
        return true;
    };

    auto refresh_mv = [&]() {
        mv = ram[mp];
        auto it = inv_cache.find(mv);
        if (it != inv_cache.end()) {
            mvi = it->second;
        } else {
            mvi = inv_m31(mv);
            inv_cache.emplace(mv, mvi);
        }
    };

    while ((int64_t)ip < code_len) {
        uint32_t ci = code[ip];
        uint32_t ni = ((int64_t)ip == code_len - 1) ? 0 : code[ip + 1];
        if (!record(ci, ni)) { *trace_len = rows; *output_len = out_pos; return BF_ERR_TRACE_OVERFLOW; }

        switch (ci) {
            case '>':
                mp = (uint32_t)((mp + 1ULL) % P);
                if (mp >= (uint64_t)ram_size) { *trace_len = rows; *output_len = out_pos; return BF_ERR_MP_RANGE; }
                refresh_mv();
                break;
            case '<':
                mp = (uint32_t)((mp + P - 1) % P);
                if (mp >= (uint64_t)ram_size) { *trace_len = rows; *output_len = out_pos; return BF_ERR_MP_RANGE; }
                refresh_mv();
                break;
            case '+':
                ram[mp] = (uint32_t)((ram[mp] + 1ULL) % P);
                refresh_mv();
                break;
            case '-':
                ram[mp] = (uint32_t)((ram[mp] + P - 1) % P);
                refresh_mv();
                break;
            case ',': {
                if (in_pos >= input_len) { *trace_len = rows; *output_len = out_pos; return BF_ERR_INPUT_EOF; }
                ram[mp] = input[in_pos++];
                refresh_mv();
                break;
            }
            case '.': {
                if (out_pos >= output_cap) { *trace_len = rows; *output_len = out_pos; return BF_ERR_OUTPUT_OVERFLOW; }
                output[out_pos++] = (uint8_t)(ram[mp] & 0xFF);
                refresh_mv();
                break;
            }
            case '[': {
                uint32_t argument = code[ip + 1];
                if (ram[mp] == 0) {
                    ip = argument;  // +1 applied below
                } else {
                    ip += 1;
                    refresh_mv();
                }
                break;
            }
            case ']': {
                uint32_t argument = code[ip + 1];
                if (ram[mp] != 0) {
                    ip = (uint64_t)argument - 1;  // +1 applied below
                } else {
                    ip += 1;
                    refresh_mv();
                }
                break;
            }
            default:
                *trace_len = rows;
                *output_len = out_pos;
                return BF_ERR_BAD_INSTRUCTION;
        }
        clk += 1;
        ip += 1;
    }

    // final row: ci = ni = 0 (machine.rs:156-160)
    if (!record(0, 0)) { *trace_len = rows; *output_len = out_pos; return BF_ERR_TRACE_OVERFLOW; }
    *trace_len = rows;
    *output_len = out_pos;
    return BF_OK;
}

}  // extern "C"
