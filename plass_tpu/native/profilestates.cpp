// ProfileStates discretization kernels — exact float-semantics replicas of
// the reference's context-state assignment (ProfileStates.cpp:308-448,
// ProfileStates.h:61-106). Used by profile2cs (profile2cs.cpp:16-105) and
// convertprofiledb. The reference compiles with AVX2, so the squared-diff
// reduction runs in 8 float lanes accumulated per chunk and then summed
// lane-by-lane; we reproduce that accumulation order scalar-wise.
#include <cfloat>
#include <cstdint>
#include <cstring>

// MathUtil::flog2 (MathUtil.h:107-119)
static inline float ps_flog2(float x) {
    if (x <= 0) return -128;
    int px;
    memcpy(&px, &x, 4);
    float e = (float)(((px & 0x7F800000) >> 23) - 0x7f);
    px = (px & 0x007FFFFF) | 0x3f800000;
    memcpy(&x, &px, 4);
    x -= 1.0;
    x *= (1.441740 + x * (-0.7077702 + x * (0.4123442 + x * (-0.1903190 + x * 0.0440047))));
    return x + e;
}

// MathUtil::fpow2 (MathUtil.h:121-146)
static inline double ps_fpow2_impl(float x) {
    if (x >= 128) return 3.402823466e+38;
    if (x <= -125) return 0.0f;
    float tx = (x - 0.5f) + (3 << 22);
    int lx;
    memcpy(&lx, &tx, 4);
    lx -= 0x4b400000;
    float dx = x - (float)(lx);
    x = 1.0f + dx * (0.693019f + dx * (0.241404f + dx * (0.0520749f + dx * 0.0134929f)));
    int px;
    memcpy(&px, &x, 4);
    px += (lx << 23);
    memcpy(&x, &px, 4);
    return x;
}

// ProfileStates::score(profileA, background, profileB) — the HHBlits
// column score: flog2(sum_aa B[aa]*A[aa]/bg[aa]) (ProfileStates.h:96-103).
static inline float ps_score_impl(const float* a, const float* b,
                                  const float* bg) {
    float result = 0.0f;
    for (int aa = 0; aa < 20; aa++) {
        result += b[aa] * a[aa] / bg[aa];
    }
    return ps_flog2(result);
}

extern "C" {

double ps_fpow2(float x) { return ps_fpow2_impl(x); }

float ps_score(const float* a, const float* b, const float* bg) {
    return ps_score_impl(a, b, bg);
}

// discProfScores[k][l] = score(profiles[k], profiles[l])
// (ProfileStates.cpp:248-263); out is (K, ceilK) zero-initialised.
void ps_disc_scores(const float* states, const float* bg, int64_t K,
                    int64_t ceilK, float* out) {
    for (int64_t k = 0; k < K; k++) {
        for (int64_t l = 0; l < K; l++) {
            out[k * ceilK + l] =
                ps_score_impl(states + k * 20, states + l * 20, bg);
        }
    }
}

// ProfileStates::discretize (ProfileStates.cpp:308-397). prof is (L,20)
// probability columns; states (K,20); prior and disc zero-padded to ceilK
// (mirrors the reference's zero-padded repScore/discProfScores reads past
// alphSize, which contribute exactly 0 to the sum).
void ps_discretize(const float* prof, int64_t L, const float* states,
                   const float* prior, const float* disc, const float* bg,
                   int64_t K, int64_t ceilK, uint8_t* out) {
    float repScore[256];
    memset(repScore, 0, sizeof(repScore));
    for (int64_t i = 0; i < L; i++) {
        const float* col = prof + i * 20;
        float minDiffScore = FLT_MAX;
        char closestState = 0;
        for (int64_t k = 0; k < K; k++) {
            repScore[k] = ps_score_impl(col, states + k * 20, bg);
        }
        for (int64_t k = 0; k < K; k++) {
            float lanes[8] = {0, 0, 0, 0, 0, 0, 0, 0};
            const float* dk = disc + k * ceilK;
            for (int64_t l = 0; l < ceilK; l += 8) {
                for (int j = 0; j < 8; j++) {
                    float diff = repScore[l + j] - dk[l + j];
                    lanes[j] += prior[l + j] * (diff * diff);
                }
            }
            float curDiffScore = 0.0f;
            for (int j = 0; j < 8; j++) curDiffScore += lanes[j];
            if (curDiffScore < minDiffScore) {
                minDiffScore = curDiffScore;
                closestState = (char)k;
            }
        }
        out[i] = (uint8_t)closestState;
    }
}

// ProfileStates::discretizeCs219 (ProfileStates.cpp:401-423): posterior
// argmax of prior[k] * score(state_k, column); first max wins (strict >).
void ps_discretize_cs219(const float* prof, int64_t L, const float* states,
                         const float* prior, const float* bg, int64_t K,
                         uint8_t* out) {
    for (int64_t i = 0; i < L; i++) {
        const float* col = prof + i * 20;
        double max = -FLT_MAX;
        int64_t k_max = 0;
        for (int64_t k = 0; k < K; k++) {
            float rep = prior[k] * ps_score_impl(states + k * 20, col, bg);
            k_max = (rep > max) ? k : k_max;
            max = (rep > max) ? rep : max;
        }
        out[i] = (uint8_t)k_max;
    }
}

}  // extern "C"
