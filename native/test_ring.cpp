// Unit test for the SPSC ring buffer in tunio.cpp (run under
// -fsanitize=address,undefined in CI — the analogue of the reference's
// sanitizer matrix, reference CMakeLists.txt:8-10 / build.yml:17-24).
//
// Build/run: make -C native test  (or asan-test for the sanitized build)

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
void* pm_ring_create(size_t capacity_pow2);
void pm_ring_destroy(void* ring);
size_t pm_ring_readable(void* ring);
size_t pm_ring_writable(void* ring);
size_t pm_ring_write(void* ring, const uint8_t* buf, size_t n);
size_t pm_ring_read(void* ring, uint8_t* buf, size_t n);
}

#define CHECK(cond)                                                     \
    do {                                                                \
        if (!(cond)) {                                                  \
            std::fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__, \
                         #cond);                                        \
            std::exit(1);                                               \
        }                                                               \
    } while (0)

static void test_basic()
{
    void* r = pm_ring_create(100); // rounds up to 128
    CHECK(pm_ring_writable(r) == 128);
    CHECK(pm_ring_readable(r) == 0);
    uint8_t in[64];
    for (int i = 0; i < 64; ++i) {
        in[i] = static_cast<uint8_t>(i);
    }
    CHECK(pm_ring_write(r, in, 64) == 64);
    CHECK(pm_ring_readable(r) == 64);
    uint8_t out[64] = { 0 };
    CHECK(pm_ring_read(r, out, 64) == 64);
    CHECK(std::memcmp(in, out, 64) == 0);
    // overfill: write clamps to available space
    uint8_t big[200];
    std::memset(big, 0xAB, sizeof(big));
    CHECK(pm_ring_write(r, big, 200) == 128);
    CHECK(pm_ring_write(r, big, 1) == 0);
    CHECK(pm_ring_read(r, big, 200) == 128);
    pm_ring_destroy(r);
}

static void test_wraparound()
{
    void* r = pm_ring_create(16);
    uint8_t buf[11];
    uint8_t out[11];
    uint8_t seq = 0;
    for (int iter = 0; iter < 1000; ++iter) {
        size_t n = 1 + static_cast<size_t>(iter % 11);
        for (size_t i = 0; i < n; ++i) {
            buf[i] = seq++;
        }
        CHECK(pm_ring_write(r, buf, n) == n);
        CHECK(pm_ring_read(r, out, n) == n);
        CHECK(std::memcmp(buf, out, n) == 0);
    }
    pm_ring_destroy(r);
}

static void test_spsc_threads()
{
    void* r = pm_ring_create(1 << 10);
    constexpr size_t total = 1 << 20;
    std::thread producer([&] {
        uint8_t buf[97];
        size_t sent = 0;
        uint8_t seq = 0;
        while (sent < total) {
            size_t want = std::min(sizeof(buf), total - sent);
            for (size_t i = 0; i < want; ++i) {
                buf[i] = static_cast<uint8_t>(seq + i);
            }
            size_t n = pm_ring_write(r, buf, want);
            sent += n;
            seq = static_cast<uint8_t>(seq + n);
        }
    });
    size_t got = 0;
    uint8_t expect = 0;
    uint8_t buf[131];
    while (got < total) {
        size_t n = pm_ring_read(r, buf, sizeof(buf));
        for (size_t i = 0; i < n; ++i) {
            CHECK(buf[i] == expect);
            ++expect;
        }
        got += n;
    }
    producer.join();
    CHECK(pm_ring_readable(r) == 0);
    pm_ring_destroy(r);
}

int main()
{
    test_basic();
    test_wraparound();
    test_spsc_threads();
    std::puts("ring tests ok");
    return 0;
}
