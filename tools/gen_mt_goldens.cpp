// Golden generator for std::mt19937 + uniform_real_distribution<float> parity.
// Mirrors the reference envs' RNG usage (robot_walk.cpp:21,82-84 etc.):
//   std::mt19937 rng(seed); std::uniform_real_distribution<float> rd_uni(0,1);
// Prints the first N draws for a set of seeds as hex-exact float bits.
#include <cstdio>
#include <cstring>
#include <random>

int main(int argc, char** argv) {
    unsigned seed = argc > 1 ? (unsigned)atoi(argv[1]) : 1234u;
    int n = argc > 2 ? atoi(argv[2]) : 16;
    std::mt19937 rng(seed);
    std::uniform_real_distribution<float> rd(0.f, 1.f);
    for (int i = 0; i < n; i++) {
        float f = rd(rng);
        unsigned bits;
        memcpy(&bits, &f, 4);
        printf("%08x %.9g\n", bits, f);
    }
    return 0;
}
