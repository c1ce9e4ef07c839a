// Fake libaravis: implements the exact symbol subset the shim
// (aravis_shim.cpp) resolves, backed by a synthetic camera, so the test
// suite can exercise the REAL dlopen/ctypes plumbing end-to-end on a
// machine with no GigE hardware and no Aravis install.  Point the shim at
// it with HEIMDALL_ARAVIS_LIB=<path to libaravis_fake.so>.
//
// The synthetic scene mirrors the reference's simulated GigE cameras
// (rust/heimdall-gige/src/camera.rs:598-778): gradient background, bright
// bottle rectangle, deterministic dark defect blob every 3rd frame.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <atomic>

namespace {

constexpr int kWidth = 320;
constexpr int kHeight = 240;
constexpr int kNumDevices = 2;

struct FakeCamera {
    uint32_t magic = 0xA7A715;
    int frame_counter = 0;
    double exposure_us = 10000.0;
    double gain_db = 0.0;
    double fps = 30.0;
    int acquisition_mode = -1;
    bool acquiring = false;
    int triggers = 0;
};

struct FakeStream {
    uint32_t magic = 0x57BEA4;
    FakeCamera *camera = nullptr;
    void *buffers[16] = {nullptr};
    int n_buffers = 0;
};

struct FakeBuffer {
    uint32_t magic = 0xB0FFE2;
    size_t size = 0;
    int status = 0;  // ARV_BUFFER_STATUS_SUCCESS
    uint8_t data[kWidth * kHeight];
};

void synthesize(FakeCamera *cam, uint8_t *out) {
    int n = cam->frame_counter++;
    for (int y = 0; y < kHeight; ++y)
        for (int x = 0; x < kWidth; ++x)
            out[y * kWidth + x] =
                static_cast<uint8_t>(60 + (x * 80) / kWidth);
    // bottle
    for (int y = kHeight / 4; y < 3 * kHeight / 4; ++y)
        for (int x = kWidth / 3; x < 2 * kWidth / 3; ++x)
            out[y * kWidth + x] = 200;
    // deterministic defect every 3rd frame
    if (n % 3 == 0) {
        int cy = kHeight / 2, cx = kWidth / 2, r = 6;
        for (int y = cy - r; y <= cy + r; ++y)
            for (int x = cx - r; x <= cx + r; ++x)
                if ((y - cy) * (y - cy) + (x - cx) * (x - cx) <= r * r)
                    out[y * kWidth + x] = 20;
    }
}

}  // namespace

extern "C" {

void arv_update_device_list() {}

unsigned arv_get_n_devices() { return kNumDevices; }

const char *arv_get_device_id(unsigned index) {
    static const char *ids[kNumDevices] = {"Fake-GigE-0", "Fake-GigE-1"};
    return index < kNumDevices ? ids[index] : nullptr;
}

void *arv_camera_new(const char *device_id, void **error) {
    (void)error;
    if (device_id && std::strncmp(device_id, "Fake-GigE-", 10) != 0)
        return nullptr;  // unknown device
    return new FakeCamera();
}

void arv_camera_get_region(void *cam, int *x, int *y, int *w, int *h,
                           void **error) {
    (void)cam; (void)error;
    if (x) *x = 0;
    if (y) *y = 0;
    if (w) *w = kWidth;
    if (h) *h = kHeight;
}

void arv_camera_set_exposure_time(void *cam, double us, void **error) {
    (void)error;
    static_cast<FakeCamera *>(cam)->exposure_us = us;
}

void arv_camera_set_gain(void *cam, double db, void **error) {
    (void)error;
    static_cast<FakeCamera *>(cam)->gain_db = db;
}

void arv_camera_set_acquisition_mode(void *cam, int mode, void **error) {
    (void)error;
    static_cast<FakeCamera *>(cam)->acquisition_mode = mode;
}

void arv_camera_set_frame_rate(void *cam, double fps, void **error) {
    (void)error;
    static_cast<FakeCamera *>(cam)->fps = fps;
}

unsigned arv_camera_get_payload(void *cam, void **error) {
    (void)cam; (void)error;
    return kWidth * kHeight;
}

void *arv_camera_create_stream(void *cam, void *cb, void *user,
                               void **error) {
    (void)cb; (void)user; (void)error;
    auto *s = new FakeStream();
    s->camera = static_cast<FakeCamera *>(cam);
    return s;
}

void *arv_buffer_new(size_t size, void *preallocated) {
    (void)preallocated;
    auto *b = new FakeBuffer();
    b->size = size < sizeof(b->data) ? size : sizeof(b->data);
    return b;
}

void arv_stream_push_buffer(void *stream, void *buffer) {
    auto *s = static_cast<FakeStream *>(stream);
    if (s->n_buffers < 16) s->buffers[s->n_buffers++] = buffer;
}

void arv_camera_start_acquisition(void *cam, void **error) {
    (void)error;
    static_cast<FakeCamera *>(cam)->acquiring = true;
}

void arv_camera_stop_acquisition(void *cam, void **error) {
    (void)error;
    static_cast<FakeCamera *>(cam)->acquiring = false;
}

void arv_camera_software_trigger(void *cam, void **error) {
    (void)error;
    static_cast<FakeCamera *>(cam)->triggers++;
}

void *arv_stream_timeout_pop_buffer(void *stream, uint64_t timeout_us) {
    (void)timeout_us;
    auto *s = static_cast<FakeStream *>(stream);
    if (!s->camera->acquiring || s->n_buffers == 0) return nullptr;
    auto *b = static_cast<FakeBuffer *>(s->buffers[--s->n_buffers]);
    synthesize(s->camera, b->data);
    b->status = 0;
    return b;
}

int arv_buffer_get_status(void *buffer) {
    return static_cast<FakeBuffer *>(buffer)->status;
}

const void *arv_buffer_get_data(void *buffer, size_t *size) {
    auto *b = static_cast<FakeBuffer *>(buffer);
    if (size) *size = b->size;
    return b->data;
}

void g_object_unref(void *obj) {
    // The shim only unrefs streams and cameras; identify by magic.
    auto magic = *static_cast<uint32_t *>(obj);
    if (magic == 0x57BEA4) {
        auto *s = static_cast<FakeStream *>(obj);
        for (int i = 0; i < s->n_buffers; ++i)
            delete static_cast<FakeBuffer *>(s->buffers[i]);
        delete s;
    } else if (magic == 0xA7A715) {
        delete static_cast<FakeCamera *>(obj);
    }
}

}  // extern "C"
