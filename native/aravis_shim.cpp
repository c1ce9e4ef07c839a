// Aravis/GigE Vision binding shim.
//
// The reference's camera layer (rust/heimdall-camera/src/aravis.rs:9-340,
// rust/heimdall-gige) declares Aravis support but simulates every call.
// This shim is the real seam: it dlopens libaravis at runtime (no
// build-time dependency — the inspection host image may or may not ship
// GigE support) and exposes a minimal C ABI that the Python HAL drives
// through ctypes (heimdall_tpu/camera/aravis.py).
//
// The dlopen target can be overridden with HEIMDALL_ARAVIS_LIB, which is
// also how the test suite exercises this exact code path end-to-end
// against a fake libaravis (native/aravis_fake.cpp) without hardware.
//
// Aravis 0.8 C API subset used (all GError** parameters passed NULL, GLib
// convention for "ignore errors"; failures surface as NULL returns):
//   arv_update_device_list, arv_get_n_devices, arv_get_device_id,
//   arv_camera_new, arv_camera_get_region, arv_camera_set_exposure_time,
//   arv_camera_set_gain, arv_camera_set_acquisition_mode,
//   arv_camera_set_frame_rate, arv_camera_get_payload,
//   arv_camera_create_stream, arv_stream_push_buffer, arv_buffer_new,
//   arv_camera_start_acquisition, arv_camera_stop_acquisition,
//   arv_camera_software_trigger, arv_stream_timeout_pop_buffer,
//   arv_buffer_get_status, arv_buffer_get_data, g_object_unref.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <dlfcn.h>
#include <mutex>

namespace {

// --- resolved libaravis entry points ---------------------------------------
struct AravisApi {
    void *handle = nullptr;

    void (*update_device_list)() = nullptr;
    unsigned (*get_n_devices)() = nullptr;
    const char *(*get_device_id)(unsigned) = nullptr;
    void *(*camera_new)(const char *, void **) = nullptr;
    void (*camera_get_region)(void *, int *, int *, int *, int *, void **) =
        nullptr;
    void (*camera_set_exposure_time)(void *, double, void **) = nullptr;
    void (*camera_set_gain)(void *, double, void **) = nullptr;
    void (*camera_set_acquisition_mode)(void *, int, void **) = nullptr;
    void (*camera_set_frame_rate)(void *, double, void **) = nullptr;
    unsigned (*camera_get_payload)(void *, void **) = nullptr;
    void *(*camera_create_stream)(void *, void *, void *, void **) = nullptr;
    void (*stream_push_buffer)(void *, void *) = nullptr;
    void *(*buffer_new)(size_t, void *) = nullptr;
    void (*camera_start_acquisition)(void *, void **) = nullptr;
    void (*camera_stop_acquisition)(void *, void **) = nullptr;
    void (*camera_software_trigger)(void *, void **) = nullptr;
    void *(*stream_timeout_pop_buffer)(void *, uint64_t) = nullptr;
    int (*buffer_get_status)(void *) = nullptr;
    const void *(*buffer_get_data)(void *, size_t *) = nullptr;
    void (*object_unref)(void *) = nullptr;
};

AravisApi g_api;
std::once_flag g_load_once;
bool g_loaded = false;

template <typename T>
bool resolve(void *h, const char *name, T *fn) {
    *fn = reinterpret_cast<T>(dlsym(h, name));
    return *fn != nullptr;
}

void load_aravis() {
    const char *override_path = std::getenv("HEIMDALL_ARAVIS_LIB");
    const char *candidates[] = {
        override_path,
        "libaravis-0.8.so.0",
        "libaravis-0.8.so",
        "libaravis-0.6.so.0",
    };
    void *h = nullptr;
    for (const char *c : candidates) {
        if (!c) continue;
        h = dlopen(c, RTLD_NOW | RTLD_GLOBAL);
        if (h) break;
    }
    if (!h) return;

    bool ok = true;
    ok &= resolve(h, "arv_update_device_list", &g_api.update_device_list);
    ok &= resolve(h, "arv_get_n_devices", &g_api.get_n_devices);
    ok &= resolve(h, "arv_get_device_id", &g_api.get_device_id);
    ok &= resolve(h, "arv_camera_new", &g_api.camera_new);
    ok &= resolve(h, "arv_camera_get_region", &g_api.camera_get_region);
    ok &= resolve(h, "arv_camera_set_exposure_time",
                  &g_api.camera_set_exposure_time);
    ok &= resolve(h, "arv_camera_set_gain", &g_api.camera_set_gain);
    ok &= resolve(h, "arv_camera_set_acquisition_mode",
                  &g_api.camera_set_acquisition_mode);
    ok &= resolve(h, "arv_camera_set_frame_rate",
                  &g_api.camera_set_frame_rate);
    ok &= resolve(h, "arv_camera_get_payload", &g_api.camera_get_payload);
    ok &= resolve(h, "arv_camera_create_stream",
                  &g_api.camera_create_stream);
    ok &= resolve(h, "arv_stream_push_buffer", &g_api.stream_push_buffer);
    ok &= resolve(h, "arv_buffer_new", &g_api.buffer_new);
    ok &= resolve(h, "arv_camera_start_acquisition",
                  &g_api.camera_start_acquisition);
    ok &= resolve(h, "arv_camera_stop_acquisition",
                  &g_api.camera_stop_acquisition);
    ok &= resolve(h, "arv_camera_software_trigger",
                  &g_api.camera_software_trigger);
    ok &= resolve(h, "arv_stream_timeout_pop_buffer",
                  &g_api.stream_timeout_pop_buffer);
    ok &= resolve(h, "arv_buffer_get_status", &g_api.buffer_get_status);
    ok &= resolve(h, "arv_buffer_get_data", &g_api.buffer_get_data);
    // g_object_unref lives in libgobject, which libaravis links; RTLD_GLOBAL
    // above makes it visible.  Fall back to a default-scope lookup.
    if (!resolve(h, "g_object_unref", &g_api.object_unref))
        resolve(RTLD_DEFAULT, "g_object_unref", &g_api.object_unref);
    ok &= (g_api.object_unref != nullptr);

    if (ok) {
        g_api.handle = h;
        g_loaded = true;
    } else {
        dlclose(h);
    }
}

bool ensure_loaded() {
    std::call_once(g_load_once, load_aravis);
    return g_loaded;
}

constexpr int kBuffersPerStream = 8;
constexpr int kArvAcquisitionModeContinuous = 0;  // arvenums.h

struct CameraHandle {
    void *camera = nullptr;
    void *stream = nullptr;
    int width = 0;
    int height = 0;
    unsigned payload = 0;
};

}  // namespace

extern "C" {

int hv_aravis_available() { return ensure_loaded() ? 1 : 0; }

int hv_aravis_n_devices() {
    if (!ensure_loaded()) return 0;
    g_api.update_device_list();
    return static_cast<int>(g_api.get_n_devices());
}

int hv_aravis_device_id(int index, char *out, int cap) {
    if (!ensure_loaded() || !out || cap <= 0) return -1;
    const char *id = g_api.get_device_id(static_cast<unsigned>(index));
    if (!id) return -1;
    std::snprintf(out, static_cast<size_t>(cap), "%s", id);
    return static_cast<int>(std::strlen(out));
}

void *hv_aravis_open(const char *device_id) {
    if (!ensure_loaded()) return nullptr;
    void *cam = g_api.camera_new(
        (device_id && device_id[0]) ? device_id : nullptr, nullptr);
    if (!cam) return nullptr;
    auto *h = new CameraHandle();
    h->camera = cam;
    int x = 0, y = 0;
    g_api.camera_get_region(cam, &x, &y, &h->width, &h->height, nullptr);
    return h;
}

int hv_aravis_configure(void *handle, double exposure_us, double gain_db,
                        double fps) {
    auto *h = static_cast<CameraHandle *>(handle);
    if (!h) return -1;
    if (exposure_us > 0)
        g_api.camera_set_exposure_time(h->camera, exposure_us, nullptr);
    if (gain_db >= 0) g_api.camera_set_gain(h->camera, gain_db, nullptr);
    g_api.camera_set_acquisition_mode(h->camera,
                                      kArvAcquisitionModeContinuous,
                                      nullptr);
    if (fps > 0) g_api.camera_set_frame_rate(h->camera, fps, nullptr);
    return 0;
}

int hv_aravis_start(void *handle) {
    auto *h = static_cast<CameraHandle *>(handle);
    if (!h) return -1;
    h->payload = g_api.camera_get_payload(h->camera, nullptr);
    h->stream = g_api.camera_create_stream(h->camera, nullptr, nullptr,
                                           nullptr);
    if (!h->stream) return -1;
    for (int i = 0; i < kBuffersPerStream; ++i)
        g_api.stream_push_buffer(h->stream,
                                 g_api.buffer_new(h->payload, nullptr));
    g_api.camera_start_acquisition(h->camera, nullptr);
    return 0;
}

int hv_aravis_trigger(void *handle) {
    auto *h = static_cast<CameraHandle *>(handle);
    if (!h) return -1;
    g_api.camera_software_trigger(h->camera, nullptr);
    return 0;
}

// Returns bytes copied into out (<= cap), or -1 on timeout/error.
// w/h report the camera region so the caller can decode the layout.
long hv_aravis_grab(void *handle, uint8_t *out, long cap, int *w, int *h_out,
                    uint64_t timeout_us) {
    auto *h = static_cast<CameraHandle *>(handle);
    if (!h || !h->stream) return -1;
    void *buffer = g_api.stream_timeout_pop_buffer(h->stream, timeout_us);
    if (!buffer) return -1;
    long copied = -1;
    if (g_api.buffer_get_status(buffer) == 0 /* ARV_BUFFER_STATUS_SUCCESS */) {
        size_t size = 0;
        const void *data = g_api.buffer_get_data(buffer, &size);
        if (data && size > 0) {
            copied = static_cast<long>(size) < cap
                         ? static_cast<long>(size)
                         : cap;
            std::memcpy(out, data, static_cast<size_t>(copied));
            if (w) *w = h->width;
            if (h_out) *h_out = h->height;
        }
    }
    g_api.stream_push_buffer(h->stream, buffer);  // recycle
    return copied;
}

int hv_aravis_stop(void *handle) {
    auto *h = static_cast<CameraHandle *>(handle);
    if (!h) return -1;
    g_api.camera_stop_acquisition(h->camera, nullptr);
    if (h->stream) {
        g_api.object_unref(h->stream);
        h->stream = nullptr;
    }
    return 0;
}

void hv_aravis_close(void *handle) {
    auto *h = static_cast<CameraHandle *>(handle);
    if (!h) return;
    if (h->stream) g_api.object_unref(h->stream);
    if (h->camera) g_api.object_unref(h->camera);
    delete h;
}

}  // extern "C"
