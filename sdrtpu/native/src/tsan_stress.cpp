// ThreadSanitizer stress harness for the native host edge (SURVEY §5.2:
// "host ingest pipelines should run under TSan in CI if C++ ingest is
// written").  Exercises the concurrency surface of ringbuffer.cpp and
// ingest.cpp:
//
//   1. SPSC ring producer/consumer with randomized chunk sizes and data
//      validation (the lock-free head/tail protocol),
//   2. pump end-to-end over a socketpair with a concurrent writer,
//      stats polling from a third thread, and sample-framing checks,
//   3. overrun path (tiny ring, fast writer) — drops must stay
//      sample-aligned,
//   4. destroy-while-writing races (pump_destroy vs live recv) and
//      rapid create/destroy churn.
//
// Build & run (CI job "native-tsan"):
//   g++ -std=c++17 -O1 -g -fsanitize=thread \
//       ringbuffer.cpp ingest.cpp tsan_stress.cpp -o tsan_stress
//   TSAN_OPTIONS=halt_on_error=1 ./tsan_stress
//
// Exit code 0 and no TSan report = pass.

#include <atomic>
#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

#include <sys/socket.h>
#include <unistd.h>

struct SpscRing;
struct IngestPump;
extern "C" {
SpscRing* ring_create(int64_t capacity);
void ring_destroy(SpscRing* r);
int64_t ring_write(SpscRing* r, const uint8_t* src, int64_t len);
int64_t ring_read(SpscRing* r, uint8_t* dst, int64_t len);
int64_t ring_read_available(SpscRing* r);
int64_t ring_write_available(SpscRing* r);

IngestPump* pump_create(int fd, int64_t ring_capacity, int64_t item_size);
int64_t pump_read(IngestPump* p, uint8_t* dst, int64_t len);
int64_t pump_available(IngestPump* p);
int pump_state(IngestPump* p);
int64_t pump_total_bytes(IngestPump* p);
int64_t pump_dropped_bytes(IngestPump* p);
void pump_destroy(IngestPump* p);
}

namespace {

void ring_stress() {
    constexpr int64_t TOTAL = 8 * 1024 * 1024;
    SpscRing* r = ring_create(64 * 1024);
    std::thread producer([r] {
        std::mt19937 rng(1);
        std::vector<uint8_t> buf(9000);
        int64_t sent = 0;
        while (sent < TOTAL) {
            int64_t want = 1 + rng() % buf.size();
            if (want > TOTAL - sent) want = TOTAL - sent;
            for (int64_t i = 0; i < want; i++)
                buf[i] = (uint8_t)((sent + i) & 0xFF);
            int64_t n = ring_write(r, buf.data(), want);
            sent += n;
        }
    });
    std::mt19937 rng(2);
    std::vector<uint8_t> buf(7000);
    int64_t got = 0;
    while (got < TOTAL) {
        int64_t want = 1 + rng() % buf.size();
        int64_t n = ring_read(r, buf.data(), want);
        for (int64_t i = 0; i < n; i++) {
            if (buf[i] != (uint8_t)((got + i) & 0xFF)) {
                fprintf(stderr, "ring data corruption at %lld\n",
                        (long long)(got + i));
                abort();
            }
        }
        got += n;
    }
    producer.join();
    ring_destroy(r);
    printf("ring_stress OK (%lld bytes)\n", (long long)TOTAL);
}

int make_writer_socket(std::thread& out_thread, int64_t total,
                       int chunk_jitter) {
    int fds[2];
    if (socketpair(AF_UNIX, SOCK_STREAM, 0, fds) != 0) abort();
    int wfd = fds[0];
    out_thread = std::thread([wfd, total, chunk_jitter] {
        std::mt19937 rng(3);
        std::vector<uint8_t> buf(4096 + chunk_jitter);
        int64_t sent = 0;
        while (sent < total) {
            int64_t want = 1 + rng() % buf.size();
            if (want > total - sent) want = total - sent;
            for (int64_t i = 0; i < want; i++)
                buf[i] = (uint8_t)((sent + i) & 0xFF);
            ssize_t n = send(wfd, buf.data(), want, MSG_NOSIGNAL);
            if (n <= 0) break;  // pump died first (destroy race test)
            sent += n;
        }
        close(wfd);
    });
    return fds[1];
}

void pump_stress() {
    // Each 4-byte wire sample is its own little-endian sequence number,
    // so the consumer can verify integrity even when the pump's
    // overflow policy legitimately drops whole samples (a TSan-slowed
    // consumer WILL overflow the ring): sequence numbers must be
    // strictly increasing, never torn, and the missing count must match
    // the pump's drop accounting exactly.
    constexpr int64_t ITEMS = 1 * 1024 * 1024;
    constexpr int64_t ITEM = 4;
    constexpr int64_t TOTAL = ITEMS * ITEM;
    int fds[2];
    if (socketpair(AF_UNIX, SOCK_STREAM, 0, fds) != 0) abort();
    std::thread writer([wfd = fds[0]] {
        std::mt19937 rng(3);
        std::vector<uint8_t> buf;
        int64_t item = 0;
        while (item < ITEMS) {
            int64_t want = 1 + rng() % 2048;
            if (want > ITEMS - item) want = ITEMS - item;
            buf.resize(want * ITEM);
            for (int64_t i = 0; i < want; i++) {
                uint32_t v = (uint32_t)(item + i);
                memcpy(&buf[i * ITEM], &v, 4);
            }
            // stream sockets may send short; advance by actual bytes
            int64_t off = 0;
            while (off < (int64_t)buf.size()) {
                ssize_t n = send(wfd, buf.data() + off, buf.size() - off,
                                 MSG_NOSIGNAL);
                if (n <= 0) { close(wfd); return; }
                off += n;
            }
            item += want;
        }
        close(wfd);
    });
    IngestPump* p = pump_create(fds[1], 64 * 1024, ITEM);
    std::atomic<bool> done{false};
    std::thread poller([&] {  // concurrent stats reads (the GUI/metrics path)
        while (!done.load()) {
            (void)pump_total_bytes(p);
            (void)pump_dropped_bytes(p);
            (void)pump_state(p);
            (void)pump_available(p);
        }
    });
    std::vector<uint8_t> buf(64 * 1024 + ITEM);
    int64_t carry = 0;
    int64_t got_items = 0;
    int64_t expect = 0;  // next sequence number must be >= this
    while (!(pump_state(p) != 0 && pump_available(p) == 0)) {
        int64_t n = pump_read(p, buf.data() + carry, 64 * 1024);
        if (n == 0) continue;
        int64_t total = carry + n;
        int64_t whole = (total / ITEM) * ITEM;
        for (int64_t i = 0; i < whole; i += ITEM) {
            uint32_t v;
            memcpy(&v, &buf[i], 4);
            if ((int64_t)v < expect || (int64_t)v >= ITEMS) {
                fprintf(stderr, "pump data corruption at %lld\n",
                        (long long)v);
                abort();
            }
            expect = (int64_t)v + 1;
            got_items++;
        }
        carry = total - whole;
        if (carry) memmove(buf.data(), buf.data() + whole, carry);
    }
    done.store(true);
    poller.join();
    writer.join();
    if (carry != 0) { fprintf(stderr, "pump left a torn sample\n"); abort(); }
    int64_t dropped = pump_dropped_bytes(p);
    if (got_items * ITEM + dropped != TOTAL) {
        fprintf(stderr, "pump accounting mismatch: got %lld dropped %lld\n",
                (long long)(got_items * ITEM), (long long)dropped);
        abort();
    }
    pump_destroy(p);
    printf("pump_stress OK (%lld items, %lld dropped, accounted)\n",
           (long long)got_items, (long long)(dropped / ITEM));
}

void overrun_stress() {
    constexpr int64_t TOTAL = 1 * 1024 * 1024;
    constexpr int64_t ITEM = 4;
    std::thread writer;
    int rfd = make_writer_socket(writer, TOTAL, 13);
    IngestPump* p = pump_create(rfd, 4096, ITEM);  // tiny ring: force drops
    writer.join();  // writer finishes; reader thread drains what fits
    std::vector<uint8_t> buf(8192);
    int64_t got = 0;
    // drain slowly so the pump keeps hitting the full ring
    while (pump_state(p) == 0 || pump_available(p) > 0) {
        int64_t n = pump_read(p, buf.data(), ITEM * 64);
        got += n;
        if (n == 0 && pump_state(p) != 0) break;
    }
    int64_t dropped = pump_dropped_bytes(p);
    if (dropped % ITEM != 0) {
        fprintf(stderr, "drop not sample aligned: %lld\n", (long long)dropped);
        abort();
    }
    if (got % ITEM != 0) {
        fprintf(stderr, "read total not sample aligned\n");
        abort();
    }
    pump_destroy(p);
    printf("overrun_stress OK (dropped %lld, read %lld)\n",
           (long long)dropped, (long long)got);
}

void destroy_race_stress() {
    // destroy the pump while the writer is mid-stream, repeatedly
    for (int i = 0; i < 25; i++) {
        std::thread writer;
        int rfd = make_writer_socket(writer, 16 * 1024 * 1024, 421);
        IngestPump* p = pump_create(rfd, 1 << 16, 4);
        std::vector<uint8_t> buf(4096);
        for (int k = 0; k < 1 + i % 5; k++) pump_read(p, buf.data(), buf.size());
        pump_destroy(p);  // races with live recv(); shutdown() must unblock
        writer.join();
    }
    printf("destroy_race_stress OK\n");
}

}  // namespace

int main() {
    ring_stress();
    pump_stress();
    overrun_stress();
    destroy_race_stress();
    printf("tsan_stress: ALL OK\n");
    return 0;
}
